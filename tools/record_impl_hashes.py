#!/usr/bin/env python
"""Stamp implementation hashes for driver-verified registry entries.

Protocol (see uber_data_pipeline_spark/queries/impl_hash.py): run this
at ROUND START, before editing anything.  At that moment the working
tree is the code the previous round's driver sweep verified, so names
green in the LATEST CORRECTNESS_r*.json get their current
implementation hash recorded in tools/impl_hashes.json.  The rotation
then treats any later in-place rewrite (hash mismatch) as
never-verified and re-fronts the entry.

--seed additionally back-fills names last green in EARLIER rounds: a
name is seeded with its current hash only if the entry function's
source and every one-level dependency's source appear verbatim in the
file blobs at that round's end-of-round snapshot commit (i.e. the code
the driver actually ran is the code in the tree today).  Entries that
changed since their last green — e.g. dedup_embedding_cosine, rewritten
in r4 over an r3 green — stay unrecorded and re-front.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from uber_data_pipeline_spark.queries import (  # noqa: E402
    _last_green_round,
    _modules,
    impl_hash,
)


def _snapshot_commits() -> dict[int, str]:
    """round -> sha of the tree the round-R driver sweep verified.

    That tree is the parent of the "round R: verdict/..." artifact
    commit (identical to the end-of-round snapshot commit where one
    exists; rounds 2-3 have no snapshot commit of their own)."""
    out: dict[int, str] = {}
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict/", subject)
        if m:
            out.setdefault(int(m.group(1)), f"{sha}^")
    return out


def _blob(commit: str, relpath: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    return r.stdout if r.returncode == 0 else None


def _sources_present_at(fn, commit: str, blob_cache: dict) -> bool:
    """True iff fn's source and all one-level deps' sources appear
    verbatim in their files as of `commit`."""
    for f in [fn] + impl_hash.dep_functions(fn):
        try:
            src = inspect.getsource(f)
            path = inspect.getsourcefile(f)
        except (OSError, TypeError):
            return False
        rel = os.path.relpath(path, ROOT)
        key = (commit, rel)
        if key not in blob_cache:
            blob_cache[key] = _blob(commit, rel)
        old = blob_cache[key]
        if old is None or src not in old:
            return False
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", action="store_true", help="git-verified back-fill")
    ap.add_argument(
        "--new",
        action="store_true",
        help="stamp registry entries with NO recorded hash (entries added "
        "mid-round, never driver-verified yet — recording is harmless "
        "because greens come from CORRECTNESS files, the hash only gates "
        "them; keeps test_impl_hashes_cover_registry green)",
    )
    args = ap.parse_args()

    fns: dict = {}
    sqls: dict[str, str] = {}
    for mod in _modules():
        fns.update(mod.QUERIES)
        sqls.update(mod.ORACLES)
    greens = _last_green_round()
    latest = max(greens.values(), default=0)
    recorded = impl_hash.recorded_hashes()
    snaps = _snapshot_commits() if args.seed else {}
    blob_cache: dict = {}

    stamped, seeded, skipped = [], [], []
    for name, fn in fns.items():
        rnd = greens.get(name)
        if rnd is None:
            if args.new and name not in recorded:
                recorded[name] = impl_hash.entry_hash(fn, sqls.get(name, ""))
                stamped.append(name)
            continue
        if args.new:
            # --new is the MID-ROUND mode: only missing names get a
            # hash. Re-stamping latest-round greens here would record
            # post-edit code against a green row the driver earned on
            # DIFFERENT code, silently disarming the regression gate
            # (the round-start protocol is the only moment the
            # working tree provably equals the verified tree).
            continue
        h = impl_hash.entry_hash(fn, sqls.get(name, ""))
        if rnd == latest:
            if recorded.get(name) != h:
                stamped.append(name)
            recorded[name] = h
        elif args.seed and name not in recorded:
            commit = snaps.get(rnd)
            if commit and _sources_present_at(fn, commit, blob_cache):
                recorded[name] = h
                seeded.append(name)
            else:
                skipped.append(name)

    with open(impl_hash.HASH_FILE, "w") as f:
        json.dump(dict(sorted(recorded.items())), f, indent=1)
        f.write("\n")
    print(
        f"latest round {latest}: stamped {len(stamped)}, "
        f"seeded {len(seeded)}, skipped (changed since green) {skipped}"
    )


if __name__ == "__main__":
    main()
