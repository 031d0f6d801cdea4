"""Implementation-aware entry hashes for the coverage rotation.

VERDICT r4 item 4: the driver rotation keys on entry NAME, so an entry
rewritten in place (e.g. ``dedup_embedding_cosine`` in round 4) kept its
old green row and rotated to the back even though the driver never
hashed the new code.  Fix: each registry entry gets an implementation
hash — md5 over the entry function's source, the source of every
package function it references one level deep, and its oracle SQL.  A
committed sidecar (``tools/impl_hashes.json``) records the hash each
entry had when the driver last verified it green; the rotation treats a
hash mismatch as "never verified", re-fronting the entry.

Maintenance protocol (enforced by ``tools/record_impl_hashes.py``): run
the recorder at ROUND START, before editing anything — at that moment
the working tree is exactly the code the previous round's driver sweep
verified, so stamping the current hash for newly-green names is sound.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

_PKG = "uber_data_pipeline_spark"

HASH_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tools",
    "impl_hashes.json",
)


def _is_pkg_fn(v) -> bool:
    return inspect.isfunction(v) and getattr(v, "__module__", "").startswith(_PKG)


def dep_functions(fn) -> list:
    """Package functions referenced one level deep from ``fn``.

    Resolution is name-based: every ``co_names`` symbol is looked up in
    the function's globals; package modules found there are then probed
    with the remaining symbols (covers ``similarity.cosine_pairs_banded``
    style attribute calls).  Deterministic order (by qualified name).
    """
    code = getattr(fn, "__code__", None)
    if code is None:
        return []
    g = getattr(fn, "__globals__", {})
    names = set(code.co_names)
    # nested lambdas/comprehensions reference names through the outer
    # code object's co_consts code children
    stack = [code]
    while stack:
        c = stack.pop()
        for const in c.co_consts:
            if inspect.iscode(const):
                names.update(const.co_names)
                stack.append(const)
    deps: dict[str, object] = {}
    mods = []
    for n in sorted(names):
        v = g.get(n)
        if v is None:
            continue
        if inspect.ismodule(v) and getattr(v, "__name__", "").startswith(_PKG):
            mods.append(v)
        elif _is_pkg_fn(v):
            deps[f"{v.__module__}.{v.__qualname__}"] = v
    for m in mods:
        for n in sorted(names):
            v = getattr(m, n, None)
            if _is_pkg_fn(v):
                deps[f"{v.__module__}.{v.__qualname__}"] = v
    return [deps[k] for k in sorted(deps)]


def entry_hash(fn, oracle_sql: str = "") -> str:
    """Stable hash of an entry's implementation (shallow+1 source)."""
    parts = []
    try:
        parts.append(inspect.getsource(fn))
    except (OSError, TypeError):
        parts.append(repr(fn))
    for dep in dep_functions(fn):
        try:
            parts.append(inspect.getsource(dep))
        except (OSError, TypeError):
            pass
    parts.append(oracle_sql or "")
    return hashlib.md5("\n".join(parts).encode("utf-8")).hexdigest()


def recorded_hashes() -> dict[str, str]:
    """name -> implementation hash at last driver verification."""
    try:
        with open(HASH_FILE) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return {k: v for k, v in data.items() if isinstance(v, str)}
