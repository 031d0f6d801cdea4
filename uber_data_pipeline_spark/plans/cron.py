"""5-field cron evaluation for the schedule-execution surface.

The reference *runs* its asset graph on a cron trigger
(``ScheduleDefinition(..., cron_schedule="@daily")`` —
Dagster_Files/definitions.py:17-20 and
src/main/uber_transformations/uber_pipeline_orchestrator/
uber_pipeline_orchestrator/definitions.py:17-20); this module supplies
the "which fire time comes next" half of that semantics so the DAG
registry can answer "what is due at time T, in what order"
(:func:`uber_data_pipeline_spark.plans.dag.due_run`).

Supports the standard 5 fields (minute hour day-of-month month
day-of-week), ``*``, lists, ranges, and ``/step``; Vixie-cron day
semantics (when BOTH dom and dow are restricted, a day matches when
EITHER does); dow 0 = Sunday. Pure control-plane arithmetic — the
schedule table is registry-sized metadata, never data-plane rows.
"""

from __future__ import annotations

import datetime as dt

_FIELDS = (
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 6),
)


def _parse_field(spec: str, lo: int, hi: int) -> frozenset:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, s = part.split("/", 1)
            step = int(s)
            if step < 1:
                raise ValueError(f"cron step {step} < 1")
        if part == "*":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            rng = range(int(part), int(part) + 1)
        for v in rng:
            if (v - rng.start) % step != 0:
                continue
            if lo == 0 and hi == 6 and v == 7:
                v = 0  # common cron alias: dow 7 = Sunday = 0
            if not (lo <= v <= hi):
                raise ValueError(f"cron value {v} outside [{lo},{hi}]")
            out.add(v)
    if not out:
        raise ValueError(f"empty cron field {spec!r}")
    return frozenset(out)


def parse_cron(expr: str) -> tuple:
    """(minutes, hours, doms, months, dows) value sets."""
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"cron needs 5 fields, got {expr!r}")
    return tuple(
        _parse_field(p, lo, hi) for p, (_, lo, hi) in zip(parts, _FIELDS)
    )


def next_fire(expr: str, after: dt.datetime) -> dt.datetime:
    """First fire time STRICTLY AFTER ``after``, minute resolution.

    Day-granular scan (minute/hour picked from the parsed sets, not
    enumerated), bounded by 8 years + 1 day so even a ``0 0 29 2 *``
    spec terminates across the century non-leap boundary (the next
    Feb 29 after 2096-03-01 is 2104-02-29, eight years out — 2100 is
    not a leap year)."""
    minutes, hours, doms, months, dows = parse_cron(expr)
    dom_star = doms == frozenset(range(1, 32))
    dow_star = dows == frozenset(range(0, 7))
    t = (after + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
    day = t.date()
    first = True
    for _ in range(366 * 8 + 1):
        cron_dow = (day.weekday() + 1) % 7  # Monday=0 -> cron Sunday=0
        day_ok = (
            (day.day in doms)
            if dow_star
            else (cron_dow in dows)
            if dom_star
            else (day.day in doms or cron_dow in dows)
        )
        if day.month in months and day_ok:
            floor_h = t.hour if first else 0
            for h in sorted(hours):
                if h < floor_h:
                    continue
                floor_m = t.minute if (first and h == t.hour) else 0
                ms = [m for m in minutes if m >= floor_m]
                if ms:
                    return dt.datetime(day.year, day.month, day.day, h, min(ms))
        day += dt.timedelta(days=1)
        first = False
    raise ValueError(f"no fire within 8 years for {expr!r}")
