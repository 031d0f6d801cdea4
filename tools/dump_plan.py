#!/usr/bin/env python
"""Dump .explain("formatted") for named registry entries to files.

Usage:
    python tools/dump_plan.py <sf_dir> <out_dir> <suffix> name [name ...]

Writes <out_dir>/<name>_<suffix>.txt per entry. Plan construction for
eager entries (streaming sinks, training loops) runs the driver-side
work; the file then holds the FINAL returned DataFrame's plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uber_data_pipeline_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _clear_all(spark) -> None:
    spark.catalog.clearCache()
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
    except Exception:  # noqa: BLE001
        pass


def main() -> int:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    spark = get_spark(app_name="udp-dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[n](spark, sf_dir).explain("formatted")
            with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {n}_{suffix}.txt")
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {n}: {e}", file=sys.stderr)
        _clear_all(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
