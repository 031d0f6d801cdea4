"""Source-fingerprinted staging for derived artifacts.

Several operators stage a derived artifact per SF (the LSH index, the
media blob lake, snapshot commit lakes, stream landing dirs) and
reuse it across runs. A `_SUCCESS`-or-existence guard proves the
WRITE finished — not that it was written FROM the current source.
When the source parquet changes under an already-staged derivative
(regenerated derived SFs; a refreshed lake in production), an
existence guard silently serves stale data — the sf1 soak caught
exactly this: a stored LSH index built from a previous corpus
generation returned 47x the correct pair count while every small-SF
check stayed green.

The fix is a content contract: a marker JSON next to the artifact
records the staging parameters AND a fingerprint (size + mtime per
file) of the source inputs; any mismatch — absent marker, changed
params, changed source — rebuilds from scratch. Markers publish
atomically (tmp + rename) and builds serialize under one process
lock, mirroring queries/pipeline._stage_snapshots_once.
"""

from __future__ import annotations

import json
import os
import shutil
import threading

_LOCK = threading.RLock()


def source_fingerprint(*paths: str) -> dict:
    """{path: "size:mtime_ns"} over files; directories walk their
    files (sorted) and fold into one entry."""
    out: dict[str, str] = {}
    for p in paths:
        if os.path.isdir(p):
            total, newest = 0, 0
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    total += st.st_size
                    newest = max(newest, st.st_mtime_ns)
            out[p] = f"{total}:{newest}"
        else:
            st = os.stat(p)
            out[p] = f"{st.st_size}:{st.st_mtime_ns}"
    return out


def ensure_staged(root: str, params: dict, build_fn, valid_fn=None) -> str:
    """Build-once guard with a staleness contract: reuse the artifact
    at ``root`` only when its marker matches ``params`` exactly
    (include a source_fingerprint() in params to bind the artifact to
    its inputs) AND the optional ``valid_fn(root)`` postcondition
    holds (e.g. a Spark ``_SUCCESS`` file exists); otherwise wipe and
    rebuild via ``build_fn(root)``. ``valid_fn`` is re-asserted after
    the build so a write that silently failed its postcondition can
    never publish a marker. Returns ``root``."""
    marker = os.path.join(root, "_STAGED.json")
    with _LOCK:
        if os.path.exists(marker):
            try:
                with open(marker) as fh:
                    if json.load(fh) == params and (
                        valid_fn is None or valid_fn(root)
                    ):
                        return root
            except ValueError:
                pass  # corrupt marker (crash mid-publish) -> restage
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        build_fn(root)
        if valid_fn is not None and not valid_fn(root):
            raise RuntimeError(
                f"staged build at {root} failed its validity postcondition"
            )
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(params, fh)
        os.replace(tmp, marker)
    return root
