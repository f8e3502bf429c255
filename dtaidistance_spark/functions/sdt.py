"""Swinging-door trending (SDT) compression — the industrial
process-historian downsampler (Bristol 1990; the PI archive's
compression algorithm): keep the sparsest subset of points such that
linear interpolation between consecutive kept points stays within a
tolerance band of EVERY skipped point.

The classic greedy door test alone guarantees only that SOME line from
the anchor fits the band — the actual segment to the kept point can
exceed the band on adversarial shapes — so this implementation adds an
exact verification pass per emitted segment: any violating skipped
point becomes an additional kept point (recursive worst-point split),
making the <= tol reconstruction guarantee unconditional. The split
triggers rarely on realistic signals (gated).

Scale shape: one series = one unit of work inside an Arrow-batched
kernel (the LTTB/matrix-profile distribution pattern) — per-series
cost is O(n) doors + O(n log n) worst-case splits.
"""

from __future__ import annotations

import numpy as np


def _verify_split(ts, vals, a, b, tol, keep):
    """Ensure segment a->b reconstructs within tol; split at the worst
    violator recursively, collecting extra kept indices into ``keep``."""
    if b - a < 2:
        return
    t = ts[a + 1 : b]
    interp = vals[a] + (vals[b] - vals[a]) * (t - ts[a]) / (ts[b] - ts[a])
    err = np.abs(interp - vals[a + 1 : b])
    w = int(np.argmax(err))
    if err[w] <= tol:
        return
    mid = a + 1 + w
    keep.append(mid)
    _verify_split(ts, vals, a, mid, tol, keep)
    _verify_split(ts, vals, mid, b, tol, keep)


def swinging_door(ts, vals, tol: float):
    """Kept-point indices (sorted, always includes first and last).

    ``ts`` strictly increasing float64 seconds; ``vals`` float64.
    Guarantee: for every i, |interp(ts[i]) - vals[i]| <= tol where
    interp is the piecewise-linear reconstruction through the kept
    points (the door pass is the fast path; the verify pass enforces
    the bound unconditionally)."""
    ts = np.asarray(ts, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    n = len(vals)
    if n <= 2:
        return list(range(n))
    keep = [0]
    a = 0
    smin, smax = -np.inf, np.inf
    j = 1
    while j < n:
        dt = ts[j] - ts[a]
        hi = (vals[j] + tol - vals[a]) / dt
        lo = (vals[j] - tol - vals[a]) / dt
        smax = min(smax, hi)
        smin = max(smin, lo)
        if smin > smax:  # doors closed: commit segment to j-1
            keep.append(j - 1)
            a = j - 1
            smin, smax = -np.inf, np.inf
            # reprocess j against the new anchor
            continue
        j += 1
    keep.append(n - 1)
    keep = sorted(set(keep))
    # unconditional tolerance guarantee
    extra: list[int] = []
    for x, y in zip(keep, keep[1:]):
        _verify_split(ts, vals, x, y, tol, extra)
    return sorted(set(keep) | set(extra))
