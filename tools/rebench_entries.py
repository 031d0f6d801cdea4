#!/usr/bin/env python
"""Targeted re-measurement of named registry entries with bench.py's
exact methodology (full-column noop-sink write + observe() row count,
min of up to 4 reps — see bench.py's estimator comment, VERDICT r11
item 1 — compile warm-up at sf0.001), for refreshing
individual BENCH_sf1.json rows after a code change without re-running
the whole 186-entry soak (VERDICT r8 items 3/5/6).

Usage:
    python tools/rebench_entries.py <sf_dir> name [name ...]

Prints ONE JSON line: {"sf_dir", "commit", "entries": {name:
{"min_s", "reps", "rows"}}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uber_data_pipeline_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _clear_all(spark) -> None:
    """clearCache + unpersist all persistent RDDs: localCheckpoint
    blocks survive clearCache and otherwise accumulate across a
    multi-entry sweep (see bench.py's twin)."""
    spark.catalog.clearCache()
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
    except Exception:  # noqa: BLE001
        pass


REP_THRESHOLD_S = 0.3


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="udp-rebench")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    # compile warm-up (bench.py's pass, restricted to the subset):
    # whole-stage-codegen compiles per generated stage source; run the
    # same plans at the smallest SF so janino compile isn't billed
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = "/root/testdata/sf0.001"
    for n in names:
        try:
            qs[n](spark, warm_dir).count()
        except Exception:  # noqa: BLE001
            pass
        _clear_all(spark)

    from uber_data_pipeline_spark.testing import timed_noop_run

    out: dict = {}
    for n in names:
        best, reps, rows = timed_noop_run(
            spark, qs[n], sf_dir, _clear_all, REP_THRESHOLD_S
        )
        out[n] = {
            "min_s": best,
            "reps": reps,
            "rows": rows,
        }
        print(f"{n}: {out[n]}", file=sys.stderr, flush=True)

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    print(json.dumps({"sf_dir": sf_dir, "commit": commit, "entries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
