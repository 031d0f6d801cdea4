#!/usr/bin/env python
"""Per-entry A/B of the spread_rowlocal opt-in (VERDICT r12 item 2):
time each named registry entry with ``spark.udp.spread.enabled=true``
then ``=false`` under bench.py's exact methodology (shared
timed_noop_run kernel, sf0.001 compile warm-up). An opt-in site earns
its keep only if the spread side beats the un-spread side — the
module's own A/B standard (operators/spread.py docstring: light-map
entries LOSE, the round-robin exchange costs more than the
parallelism returns).

Usage:
    python tools/spread_ab.py <sf_dir> name [name ...]

Prints ONE JSON line: {"sf_dir", "commit", "entries": {name:
{"spread_s", "nospread_s", "delta_s"}}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uber_data_pipeline_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

REP_THRESHOLD_S = 0.3


def _clear_all(spark) -> None:
    spark.catalog.clearCache()
    try:
        it = (
            spark.sparkContext._jsc.sc()
            .getPersistentRDDs()
            .values()
            .iterator()
        )
        while it.hasNext():
            it.next().unpersist(False)
    except Exception:  # noqa: BLE001
        pass


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="udp-spread-ab")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # warm BOTH plan variants (spread on/off compile different stages)
    for flag in ("true", "false"):
        spark.conf.set("spark.udp.spread.enabled", flag)
        for n in names:
            try:
                qs[n](spark, warm_dir).count()
            except Exception:  # noqa: BLE001
                pass
            _clear_all(spark)

    from uber_data_pipeline_spark.testing import timed_noop_run

    out: dict = {}
    for n in names:
        cell = {}
        for key, flag in (("spread_s", "true"), ("nospread_s", "false")):
            spark.conf.set("spark.udp.spread.enabled", flag)
            best, reps, rows = timed_noop_run(
                spark, qs[n], sf_dir, _clear_all, REP_THRESHOLD_S
            )
            cell[key] = best
            cell[key.replace("_s", "_reps")] = reps
        spark.conf.set("spark.udp.spread.enabled", "true")
        cell["delta_s"] = round(cell["spread_s"] - cell["nospread_s"], 3)
        out[n] = cell
        print(f"{n}: {cell}", file=sys.stderr, flush=True)

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    print(json.dumps({"sf_dir": sf_dir, "commit": commit, "entries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
