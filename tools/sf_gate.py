"""Incremental large-SF oracle gate.

CORRECTNESS_sf1_partial.json stopped at 51/172 because it swept in
registry (rotation) order, which front-loads the heavy tail — the
DuckDB-side shingle/minhash recomputes burned the whole budget before
the cheap entries ran. This runner makes the sweep resumable and
cheap-first:

- seeds the already-verified set from the output file AND the partial
  artifact, so every invocation only runs what's still missing;
- orders remaining entries by their last measured bench seconds
  ascending (cheapest first), so a bounded run maximizes coverage;
- caps each DuckDB oracle with an interrupt timer (oracle-side cost
  must never wedge the sweep — a timed-out oracle is recorded as
  'oracle_timeout' and skipped, not failed);
- rewrites the output JSON after every entry (crash-safe progress).

Usage:
    python tools/sf_gate.py [sf_dir] [--out FILE] [--budget SECS]
        [--oracle-timeout SECS] [--only name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uber_data_pipeline_spark.catalog import TABLES  # noqa: E402
from uber_data_pipeline_spark.session import get_spark  # noqa: E402
from uber_data_pipeline_spark.testing import compare  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _seed_verified(out_path: str) -> set[str]:
    done: set[str] = set()
    for p in (out_path, os.path.join(ROOT, "CORRECTNESS_sf1_partial.json")):
        try:
            with open(p) as fh:
                d = json.load(fh)
            done.update(d.get("verified", []))
        except (OSError, ValueError):
            continue
    return done


def _bench_secs() -> dict[str, float]:
    try:
        with open(os.path.join(ROOT, "bench_detail.json")) as fh:
            return {
                k: float(v)
                for k, v in json.load(fh).get("queries", {}).items()
            }
    except (OSError, ValueError, TypeError):
        return {}


def _run_oracle(con, sql: str, timeout: float):
    """DuckDB execute with a wall cap: a Timer fires con.interrupt()
    so one pathological recompute can't absorb the whole budget."""
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df()
    finally:
        timer.cancel()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".artifacts/sf1.0")
    ap.add_argument("--out", default=os.path.join(ROOT, "CORRECTNESS_sf1.json"))
    ap.add_argument("--budget", type=float, default=3300.0)
    ap.add_argument("--oracle-timeout", type=float, default=240.0)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    t_start = time.monotonic()
    verified = _seed_verified(args.out)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    secs = _bench_secs()
    if args.only:
        # --only forces the named entries even if already verified
        # (an entry whose semantics changed needs a fresh sf1 row)
        todo = [n for n in qs if n in set(args.only)]
    else:
        todo = [n for n in qs if n not in verified]
    todo.sort(key=lambda n: secs.get(n, 0.0))

    state: dict = {}
    try:
        with open(args.out) as fh:
            state = json.load(fh)
    except (OSError, ValueError):
        pass
    failed = list(state.get("failed", []))
    timeouts = list(state.get("oracle_timeouts", []))

    def _flush(note: str) -> None:
        sf_name = os.path.basename(args.sf_dir.rstrip("/"))
        out = {
            "metric": "sf_oracle_gate",
            "sf": sf_name,
            "n_verified": len(verified),
            "n_registry": len(qs),
            "failed": sorted(set(failed)),
            "oracle_timeouts": sorted(set(timeouts)),
            "note": note,
            "verified": sorted(verified),
        }
        tmp = args.out + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh, indent=1)
        os.replace(tmp, args.out)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    spark = get_spark(app_name="udp-sf-gate")
    spark.sparkContext.setLogLevel("ERROR")

    note = (
        "cheap-first resumable sweep (tools/sf_gate.py); includes the "
        "entries of CORRECTNESS_sf1_partial.json; oracle_timeouts are "
        "DuckDB-side recompute cost, not engine failures"
    )
    for name in todo:
        if time.monotonic() - t_start > args.budget:
            note += "; stopped on time budget"
            break
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}", flush=True)
            spark.catalog.clearCache()
            _flush(note)
            continue
        try:
            odf = _run_oracle(con, oracles[name], args.oracle_timeout)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "INTERRUPT" in msg.upper() or "interrupted" in msg:
                timeouts.append(name)
                print(f"SKIP {name}: oracle timeout", flush=True)
            else:
                failed.append(name)
                print(f"FAIL {name}: oracle error: {e}", flush=True)
            spark.catalog.clearCache()
            _flush(note)
            continue
        problems = compare(name, sdf, odf)
        spark.catalog.clearCache()
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems), flush=True)
        else:
            verified.add(name)
            dt = time.monotonic() - t0
            print(f"PASS {name} ({len(sdf)} rows, {dt:.1f}s)", flush=True)
        _flush(note)

    _flush(note)
    print(
        f"\nverified {len(verified)}/{len(qs)}; failed={sorted(set(failed))};"
        f" oracle_timeouts={sorted(set(timeouts))}"
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
