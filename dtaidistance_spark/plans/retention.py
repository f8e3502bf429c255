"""Retention policy over continuous-aggregate tiers (the third leg of
the north rule's "rollup + downsample + retention").

TimescaleDB-style tiered retention: each tier keeps a sliding window of
history — e.g. raw 7 days, 1-minute 90 days, 1-hour 2 years, 1-day
forever — and aging data is DROPPED from fine tiers while the coarse
tiers retain it (they already rolled it up). Expiry is a pure
manifest-side partition drop (:meth:`TableIO.delete_partitions`), so:

- it is a metadata-only atomic commit — no data rewrite, O(#partitions)
  regardless of table size (the property that makes retention viable at
  10^12 rows);
- time travel to a pre-expiry snapshot still reads the dropped rows;
- a later incremental refresh does NOT resurrect dropped partitions:
  the snapshot-diff sees no upstream change for them (gated in tests).

Ordering contract: run :meth:`ContinuousAggregate.refresh` BEFORE
:func:`apply_retention` in a maintenance cycle, so coarser tiers absorb
a window's data before a finer tier expires it.
"""

from __future__ import annotations

import re
import time
from datetime import datetime, timedelta

from dtaidistance_spark.plans.continuous import ContinuousAggregate

_UNITS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400,
    "week": 7 * 86400, "month": 30 * 86400, "year": 365 * 86400,
}


def parse_duration(spec: str) -> timedelta:
    """'90 days' / '1 hour' / '3 months' / '2 years' -> timedelta.

    Fixed-width calendar units (TimescaleDB-style): month = 30 days,
    year = 365 days — retention cutoffs are sliding windows, not
    calendar arithmetic. Supported units: second, minute, hour, day,
    week, month, year (optional plural s)."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-z]+?)s?\s*", spec.lower())
    if not m or m.group(2) not in _UNITS:
        raise ValueError(
            f"bad duration: {spec!r} (expected '<n> "
            f"{'|'.join(sorted(_UNITS))}[s]')"
        )
    return timedelta(seconds=int(m.group(1)) * _UNITS[m.group(2)])


def apply_retention(
    ca: ContinuousAggregate,
    policy: dict[str, str | None],
    now: datetime | str,
    source=None,
    source_keep: str | None = None,
) -> dict:
    """Expire aged-out ``p_day`` partitions per tier.

    ``policy`` maps tier name -> keep-duration string (None = keep
    forever). ``source``/``source_keep`` optionally expire the raw
    source table too. Returns {tier: {dropped, cutoff, snapshot}};
    per-partition lineage of what was removed lives in each tier's
    manifest snapshot (op='delete', ``removed`` list).
    """
    if isinstance(now, str):
        now = datetime.fromisoformat(now)
    report: dict[str, dict] = {}
    metrics = []

    def drop_before(io, keep: str, label: str):
        cutoff = (now - parse_duration(keep)).strftime("%Y-%m-%d")
        n, snap = io.delete_partitions(
            lambda p: (p.get("p_day") or "9999") < cutoff
        )
        report[label] = {"dropped": n, "cutoff": cutoff, "snapshot": snap}
        if n:
            metrics.append((label, cutoff, n, time.time()))

    for tier, keep in policy.items():
        if keep is None:
            report[tier] = {"dropped": 0, "cutoff": None, "snapshot": None}
            continue
        if tier not in ca.tier_io:
            raise KeyError(f"unknown tier {tier!r}; have {list(ca.tier_io)}")
        drop_before(ca.tier_io[tier], keep, tier)
    if source is not None and source_keep is not None:
        drop_before(source, source_keep, "__source__")
    report["_metrics_rows"] = len(metrics)
    return report
