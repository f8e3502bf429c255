"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
the visualization-grade TSDB downsampler that keeps the perceptual
shape of a series (peaks/valleys) where bucket averages flatten it.

Pure-numpy kernel, deterministic: ties on triangle area resolve to the
earliest index (strict ``>`` comparison), so the output is a pure
function of the input — the Spark operator wraps it in ``mapInPandas``
per series and the registry check oracles the LTTB invariants that ARE
SQL-expressible (endpoints preserved, exactly one point per bucket).
"""

from __future__ import annotations

import numpy as np


def lttb(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Return the INDEXES of the selected points (ascending).

    Classic LTTB: first and last points always kept; interior points
    bucketed evenly; each bucket keeps the point forming the largest
    triangle with the previously selected point and the next bucket's
    centroid.
    """
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n if n_out >= n else min(n, max(n_out, 0)))
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # bucket b (0-based, interior) covers indices
    # [1 + b*(n-2)/(n_out-2), 1 + (b+1)*(n-2)/(n_out-2))
    bounds = 1 + (np.arange(n_out - 1) * (n - 2)) // (n_out - 2)
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    for b in range(n_out - 2):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if b + 2 <= n_out - 2:
            nlo, nhi = int(bounds[b + 1]), int(bounds[b + 2])
        else:
            nlo, nhi = n - 1, n
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        ax, ay = x[sel[b]], y[sel[b]]
        # twice the triangle area, vectorized over the bucket
        area = np.abs(
            (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
        )
        sel[b + 1] = lo + int(np.argmax(area))  # argmax: first max wins
    sel[n_out - 1] = n - 1
    return sel
