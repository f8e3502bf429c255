"""Pure-numpy time-series kernels (no pyspark import — keep pytest fast).

These re-express the reference library's DTW machinery vectorized:

- banded DTW distance (Sakoe-Chiba window, max_dist early abandoning,
  max_step, penalty, psi relaxation, PrunedDTW via the Euclidean upper
  bound)    — parity surface for ``ref:dtaidistance/dtw.py::distance``
- warping paths + best path + warp                 — ``ref:dtaidistance/dtw.py::warping_paths/best_path/warp``
- Euclidean distance / upper bound                 — ``ref:dtaidistance/ed.py::distance``,
                                                     ``ref:dtaidistance/dtw.py::ub_euclidean``
- LB_Keogh lower bound + envelopes                 — ``ref:dtaidistance/dtw.py::lb_keogh``
- LB_Kim first/last/min/max bound                  — UCR suite (Rakthanmanon et al., KDD 2012);
                                                     not in the reference, mandated by the north rule
- DBA barycenter averaging                         — ``ref:dtaidistance/dtw_barycenter.py::dba/dba_loop``
  (Petitjean et al. 2011)

NOTE ON CITATIONS: at build time ``/root/reference`` was an empty mount
(see SURVEY.md "citation integrity"); ref: paths follow the public
upstream v2.3.x layout of wannesm/dtaidistance, of which the reference
repo is a fork. Golden values come from FIXTURES.md §2.

Implementation strategy: the DP is computed along anti-diagonals so each
step is a handful of numpy ops over a band-width vector — no per-cell
Python. The batched variant stacks many (center, member) pairs of equal
padded length into one (B, band) DP for the DBA hot path.
"""

from __future__ import annotations

import math
import threading

import numpy as np

INF = np.inf


def _resolve_psi(psi):
    """psi -> (psi_1b, psi_1e, psi_2b, psi_2e); int means all four."""
    if psi is None:
        return 0, 0, 0, 0
    if isinstance(psi, (int, np.integer)):
        p = int(psi)
        return p, p, p, p
    t = tuple(int(x) for x in psi)
    if len(t) != 4:
        raise ValueError("psi must be an int or a 4-tuple (1b,1e,2b,2e)")
    return t


def _band_params(r, c, window):
    """Inclusive 0-based band for row i: j in [i - a, i + b] (pre-clip)."""
    if window is None or window <= 0:
        window = max(r, c)
    mrc = max(0, r - c)
    mcr = max(0, c - r)
    a = mrc + window - 1
    b = mcr + window - 1
    return window, a, b


def ed_distance(s1, s2):
    """Euclidean distance; unequal lengths compare the tail of the longer
    series against the last element of the shorter (upstream
    ``ref:dtaidistance/ed.py::distance`` semantics). Doubles as
    ``ub_euclidean`` — the DTW upper bound driving PrunedDTW."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    n = min(len(s1), len(s2))
    d = s1[:n] - s2[:n]
    tot = float(np.dot(d, d))
    if len(s1) > len(s2):
        t = s1[n:] - s2[n - 1]
        tot += float(np.dot(t, t))
    elif len(s2) > len(s1):
        t = s2[n:] - s1[n - 1]
        tot += float(np.dot(t, t))
    return math.sqrt(tot)


ub_euclidean = ed_distance


def lb_kim(s1, s2):
    """LB_Kim: max of |first|, |last|, |min|, |max| point differences.
    Admissible lower bound for DTW without psi relaxation."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    return float(
        max(
            abs(s1[0] - s2[0]),
            abs(s1[-1] - s2[-1]),
            abs(s1.min() - s2.min()),
            abs(s1.max() - s2.max()),
        )
    )


def lb_keogh_envelope(s, window, r=None):
    """Rolling min/max envelope of ``s`` for LB_Keogh.

    The j-range for query index i is [i - a, i + b] (inclusive, clipped),
    matching the DTW band of a pair where the query has length ``r``
    (defaults to len(s), i.e. the equal-length case). Returns (lo, hi).
    """
    s = np.asarray(s, dtype=np.float64)
    c = len(s)
    if r is None:
        r = c
    _, a, b = _band_params(r, c, window)
    a = min(a, c)
    b = min(b, c)
    pad_lo = np.concatenate([np.full(a, INF), s, np.full(b, INF)])
    pad_hi = np.concatenate([np.full(a, -INF), s, np.full(b, -INF)])
    w = a + b + 1
    lo = np.lib.stride_tricks.sliding_window_view(pad_lo, w).min(axis=1)
    hi = np.lib.stride_tricks.sliding_window_view(pad_hi, w).max(axis=1)
    return lo[:c], hi[:c]


def lb_keogh(s1, s2, window=None, envelope=None):
    """LB_Keogh lower bound: sqrt of summed squared exceedances of s1
    outside s2's band envelope. ``envelope`` lets callers pass a
    precomputed (lo, hi) — the engine materializes envelopes once per
    series (an algebraic improvement over the reference, which recomputes
    them per pair)."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    r, c = len(s1), len(s2)
    if envelope is None:
        lo, hi = lb_keogh_envelope(s2, window, r=r)
    else:
        lo, hi = envelope
    n = min(r, len(lo))
    x = s1[:n]
    above = np.maximum(x - hi[:n], 0.0)
    below = np.maximum(lo[:n] - x, 0.0)
    return math.sqrt(float(np.dot(above, above) + np.dot(below, below)))


def dtw_distance(
    s1,
    s2,
    window=None,
    max_dist=None,
    max_step=None,
    max_length_diff=None,
    penalty=None,
    psi=None,
    use_pruning=False,
    inner_dist="squared euclidean",
):
    """Banded DTW distance, semantics of ``ref:dtaidistance/dtw.py::distance``.

    Anti-diagonal numpy DP: O(r+c) vector ops, O(r) memory. Returns inf
    when abandoned (max_dist / max_length_diff) like the reference.
    """
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    r, c = len(s1), len(s2)
    if r == 0 or c == 0:
        return INF
    if max_length_diff is not None and abs(r - c) > max_length_diff:
        return INF
    squared = inner_dist == "squared euclidean"
    if use_pruning:
        # PrunedDTW: the Euclidean distance upper-bounds DTW; max_dist is
        # in distance units and squared below alongside the DP costs
        max_dist = ub_euclidean(s1, s2)
    md = INF if max_dist is None else (max_dist * max_dist if squared else max_dist)
    ms = INF if max_step is None else (max_step * max_step if squared else max_step)
    pen = 0.0 if penalty is None else (penalty * penalty if squared else penalty)
    psi_1b, psi_1e, psi_2b, psi_2e = _resolve_psi(psi)
    window, a, b = _band_params(r, c, window)

    d2, last_row, last_col = _dtw_diag_core(
        s1, s2, a, b, md, ms, pen, psi_1b, psi_2b, squared
    )
    if psi_1e == 0 and psi_2e == 0:
        best = last_row[c]
    else:
        best = min(
            np.min(last_row[max(0, c - psi_2e) : c + 1]),
            np.min(last_col[max(0, r - psi_1e) : r + 1]),
        )
    if best > md:
        return INF
    return math.sqrt(best) if squared else float(best)


def _dtw_diag_core(s1, s2, a, b, md, ms, pen, psi_1b, psi_2b, squared, matrix=None):
    """Shared anti-diagonal DP. Returns (D[r,c], last_row, last_col); if
    ``matrix`` is provided (an (r+1, c+1) float array pre-filled with inf)
    it is populated with accumulated costs for path backtracking."""
    r, c = len(s1), len(s2)
    last_row = np.full(c + 1, INF)
    last_col = np.full(r + 1, INF)
    keep = matrix is not None

    d_km2 = np.full(r + 1, INF)  # diag k-2
    d_km1 = np.full(r + 1, INF)  # diag k-1; at k=1 that is diag 0 = {(0,0)}
    d_km1[0] = 0.0
    if keep:
        matrix[0, 0] = 0.0
        matrix[0, 1 : psi_2b + 1] = 0.0
        matrix[1 : psi_1b + 1, 0] = 0.0
    if r == 0:
        last_row[0] = 0.0
    if c == 0:
        last_col[0] = 0.0
    # k = 1 boundary cells
    if 1 <= c:
        pass
    d_k = None
    abandoned = False
    # early abandoning needs TWO consecutive diagonals above the bound: a
    # diagonal step (i,j)->(i+1,j+1) skips anti-diagonal k+1 entirely, so a
    # single bad diagonal can still be hopped over by the optimal path.
    prev_min = 0.0
    for k in range(1, r + c + 1):
        d_k = np.full(r + 1, INF)
        # boundary cells on this diagonal
        if k <= c:
            d_k[0] = 0.0 if k <= psi_2b else INF  # cell (0, k)
        if k <= r:
            d_k[k] = 0.0 if k <= psi_1b else INF  # cell (k, 0)
        # interior band
        ilo = max(1, k - c, -((-(k - b)) // 2))  # ceil((k - b) / 2)
        ihi = min(r, k - 1, (k + a) // 2)
        if ilo <= ihi and not abandoned:
            I = np.arange(ilo, ihi + 1)
            x = s1[I - 1]
            y = s2[k - I - 1]
            cost = x - y
            if squared:
                cost = cost * cost
            else:
                cost = np.abs(cost)
            if ms != INF:
                cost = np.where(cost > ms, INF, cost)
            diag = d_km2[I - 1]
            up = d_km1[I - 1] + pen
            left = d_km1[I] + pen
            vals = cost + np.minimum(diag, np.minimum(up, left))
            d_k[I] = vals
        if md != INF and not abandoned:
            cur_min = float(np.min(d_k))
            if cur_min > md and prev_min > md:
                abandoned = True
            prev_min = cur_min
        if keep:
            I_all = np.arange(max(0, k - c), min(r, k) + 1)
            matrix[I_all, k - I_all] = d_k[I_all]
        if 0 <= k - r <= c:
            last_row[k - r] = d_k[r]
        if 0 <= k - c <= r:
            last_col[k - c] = d_k[k - c]
        d_km2, d_km1 = d_km1, d_k
    if r + c == 0:
        last_row[0] = last_col[0] = 0.0
    return last_row[c], last_row, last_col


def warping_paths(
    s1,
    s2,
    window=None,
    max_dist=None,
    max_step=None,
    penalty=None,
    psi=None,
    inner_dist="squared euclidean",
):
    """Full accumulated-cost matrix (``ref:dtaidistance/dtw.py::warping_paths``).

    Returns (distance, matrix). For the squared-euclidean inner distance
    the returned matrix holds sqrt of accumulated costs (as upstream).
    """
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    r, c = len(s1), len(s2)
    squared = inner_dist == "squared euclidean"
    md = INF if max_dist is None else (max_dist * max_dist if squared else max_dist)
    ms = INF if max_step is None else (max_step * max_step if squared else max_step)
    pen = 0.0 if penalty is None else (penalty * penalty if squared else penalty)
    psi_1b, psi_1e, psi_2b, psi_2e = _resolve_psi(psi)
    window, a, b = _band_params(r, c, window)
    matrix = np.full((r + 1, c + 1), INF)
    d2, last_row, last_col = _dtw_diag_core(
        s1, s2, a, b, md, ms, pen, psi_1b, psi_2b, squared, matrix=matrix
    )
    if psi_1e == 0 and psi_2e == 0:
        best = last_row[c]
    else:
        best = min(
            np.min(last_row[max(0, c - psi_2e) : c + 1]),
            np.min(last_col[max(0, r - psi_1e) : r + 1]),
        )
    if squared:
        matrix = np.sqrt(matrix)
        best = math.sqrt(best) if best != INF else INF
    return float(best), matrix


def best_path(matrix, row=None, col=None):
    """Backtrack the optimal path from (row, col) (defaults bottom-right)
    over an accumulated cost matrix from :func:`warping_paths`. Diagonal
    preferred on ties (upstream behavior). Returns [(i, j), ...] in
    sequence-index space, ascending."""
    i = (matrix.shape[0] - 1) if row is None else row
    j = (matrix.shape[1] - 1) if col is None else col
    path = []
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        d = matrix[i - 1, j - 1]
        u = matrix[i - 1, j]
        l = matrix[i, j - 1]
        if d <= u and d <= l:
            i, j = i - 1, j - 1
        elif u <= l:
            i = i - 1
        else:
            j = j - 1
    path.reverse()
    return path


def warping_path(from_s, to_s, **kwargs):
    """Convenience: optimal path between two series
    (``ref:dtaidistance/dtw.py::warping_path``)."""
    _, m = warping_paths(from_s, to_s, **kwargs)
    return best_path(m)


def warping_amount(path):
    """Count of non-diagonal moves along a path
    (``ref:dtaidistance/dtw.py::warping_amount``)."""
    amount = 0
    pi, pj = path[0]
    for i, j in path[1:]:
        if i == pi or j == pj:
            amount += 1
        pi, pj = i, j
    return amount


def warp(from_s, to_s, path=None, **kwargs):
    """Warp ``from_s`` onto ``to_s``'s time axis via the optimal path:
    each target position takes the mean of mapped source values
    (``ref:dtaidistance/dtw.py::warp``)."""
    from_s = np.asarray(from_s, dtype=np.float64)
    to_s = np.asarray(to_s, dtype=np.float64)
    if path is None:
        path = warping_path(from_s, to_s, **kwargs)
    sums = np.zeros(len(to_s))
    cnts = np.zeros(len(to_s))
    for i, j in path:
        sums[j] += from_s[i]
        cnts[j] += 1
    cnts[cnts == 0] = 1.0
    return sums / cnts


def dba_update(center, series_list, window=None):
    """One DBA iteration: align every series onto ``center`` along its
    optimal warping path, then per-center-position mean of all mapped
    values (Petitjean 2011; ``ref:dtaidistance/dtw_barycenter.py::dba``)."""
    center = np.asarray(center, dtype=np.float64)
    n = len(center)
    if center.ndim == 2:  # multivariate: one shared path, per-dim means
        sums = np.zeros(center.shape)
        cnts = np.zeros(n)
        for s in series_list:
            s = np.asarray(s, dtype=np.float64)
            path = dtw_ndim_warping_path(center, s, window=window)
            for i, j in path:
                sums[i] += s[j]
                cnts[i] += 1
        cnts[cnts == 0] = 1.0
        return sums / cnts[:, None]
    sums = np.zeros(n)
    cnts = np.zeros(n)
    for s in series_list:
        s = np.asarray(s, dtype=np.float64)
        path = warping_path(center, s, window=window)
        for i, j in path:
            sums[i] += s[j]
            cnts[i] += 1
    cnts[cnts == 0] = 1.0
    return sums / cnts


def dba(series_list, center=None, max_it=10, thr=1e-5, window=None,
        nb_initial_samples=None, nb_prob_samples=None):
    """DBA loop (``ref:dtaidistance/dtw_barycenter.py::dba_loop``).

    Deterministic: the caller must pass ``series_list`` in a stable order;
    the default initial center is the member whose length is the median
    (ties -> earliest in the list), which is order-stable.

    ``nb_initial_samples``: when ``center`` is None, evaluate that many
    candidate initial centers (evenly spaced over the stable
    length-sorted order, so k=1 is exactly the median default) and keep
    the one with the smallest total DTW cost to all members (ties to
    the earliest candidate) — the upstream multi-start knob, made
    deterministic.

    ``nb_prob_samples``: each iteration updates the average from only
    that many members — deterministically the ones FARTHEST from the
    current center (ties to the smallest index), the resume-safe
    substitute for upstream's distance-proportional random sampling
    ([VERIFY] upstream's exact sampling law once the mount is
    populated; the contract gated here: k >= len(series) reproduces the
    full-mask loop bit-for-bit, smaller k still converges and stays
    order-deterministic)."""
    series_list = [np.asarray(s, dtype=np.float64) for s in series_list]
    if not series_list:
        raise ValueError("dba needs at least one series")
    if center is None:
        lengths = [len(s) for s in series_list]
        order = sorted(range(len(series_list)), key=lambda i: (lengths[i], i))
        if nb_initial_samples is None or nb_initial_samples <= 1:
            center = series_list[order[len(order) // 2]]
        else:
            k = min(nb_initial_samples, len(order))
            picks = [order[len(order) // 2]] + [
                order[(i * (len(order) - 1)) // (k - 1)] for i in range(k)
            ]
            seen, cands = set(), []
            for i in picks:
                if i not in seen:
                    seen.add(i)
                    cands.append(i)
            best = None  # (cost, candidate order position)
            for pos, i in enumerate(cands):
                cost = sum(
                    dtw_distance(series_list[i], s, window=window)
                    for s in series_list
                )
                if best is None or (cost, pos) < best[:2]:
                    best = (cost, pos, i)
            center = series_list[best[2]]
    center = np.asarray(center, dtype=np.float64).copy()
    for _ in range(max_it):
        members = series_list
        if (
            nb_prob_samples is not None
            and 0 < nb_prob_samples < len(series_list)
        ):
            dists = [
                dtw_distance(center, s, window=window) for s in series_list
            ]
            worst = sorted(
                range(len(series_list)), key=lambda i: (-dists[i], i)
            )[:nb_prob_samples]
            members = [series_list[i] for i in sorted(worst)]
        new_center = dba_update(center, members, window=window)
        delta = float(np.max(np.abs(new_center - center)))
        center = new_center
        if delta <= thr:
            break
    return center


def paa(s, m: int):
    """Piecewise Aggregate Approximation: deterministic resample of ``s``
    to ``m`` points (segment means when shrinking, index stretch when
    growing). Classic TS downsample (Keogh et al. 2001, SAX lineage) —
    the rollup kernel normalizes ragged token arrays onto a fixed
    barycenter grid with it before DBA."""
    s = np.asarray(s, dtype=np.float64)
    n = len(s)
    if n == m:
        return s.copy()
    if n < m:
        return s[(np.arange(m) * n) // m]
    bounds = (np.arange(m + 1) * n) // m
    csum = np.concatenate([[0.0], np.cumsum(s)])
    return (csum[bounds[1:]] - csum[bounds[:-1]]) / (bounds[1:] - bounds[:-1])


def paa_fold(s, m: int):
    """PAA twin of the engine's JVM-side SQL expression
    (:data:`dtaidistance_spark.operators.rollup.PAA_SQL`): per-segment
    strictly-sequential left-fold sums (np.cumsum is sequential, and
    SQL ``aggregate(..., 0D, (acc,x) -> acc+x)`` is a left fold), so the
    two are bit-identical — the exact-parity contract between the Spark
    rollup (PAA evaluated JVM-side before the Arrow crossing) and the
    single-process reference pipeline. :func:`paa` (prefix-sum variant)
    differs in the last ulp and stays for the non-gated pair ops."""
    s = np.asarray(s, dtype=np.float64)
    n = len(s)
    if n == m:
        return s.copy()
    if n < m:
        return s[(np.arange(m) * n) // m]
    bounds = (np.arange(m + 1) * n) // m
    out = np.empty(m)
    for j in range(m):
        seg = s[bounds[j] : bounds[j + 1]]
        out[j] = seg.cumsum()[-1] / (bounds[j + 1] - bounds[j])
    return out


# ---------------------------------------------------------------------------
# Batched kernels — the DBA/assignment hot path. One anti-diagonal DP over a
# (B, r+1) stack computes B alignments at once; per-member band masks keep
# exact per-pair banded semantics even when members are padded to a common
# length.
# ---------------------------------------------------------------------------


def _band_bounds(r, c, window):
    """Per-anti-diagonal band bounds [ilo(k), ihi(k)] for k = 1..r+c,
    as two int64 arrays indexed by k-1. Both are nondecreasing in k (the
    margin-fill reuse in the DP kernels relies on this)."""
    if window is None or window <= 0:
        window = max(r, c)
    a = max(0, r - c) + window - 1
    b_ = max(0, c - r) + window - 1
    ks = np.arange(1, r + c + 1, dtype=np.int64)
    ilo = np.maximum(np.maximum(1, ks - c), -((-(ks - b_)) // 2))
    ihi = np.minimum(np.minimum(r, ks - 1), (ks + a) // 2)
    return ilo, ihi


def _dba_paths_batch(center, batch, window=None):
    """Forward DP for all members at once (uniform length, penalty 0,
    squared-euclidean inner — the DBA configuration). Returns
    ``(steps, ilo_k)``: the band-compressed step-code tensor
    steps[k, i - ilo_k[k], b] ∈ {0 diag, 1 up, 2 left} for backtracking.

    Tie preference diag > up > left matches :func:`best_path` exactly, so
    per-member results are identical to the scalar pipeline's paths.

    Memory shape: the band index range per anti-diagonal is contiguous,
    so all reads are slice VIEWS (no fancy-indexing gathers), the three
    rolling cost diagonals are preallocated and recycled (a 2-column INF
    margin fill on the nondecreasing band's trailing edge replaces the
    full-width refill), and ``steps`` stores only the band width instead
    of r+1 codes per diagonal — ~8x less memory traffic at the rollup
    shape, bit-identical results."""
    r = len(center)
    B, c = batch.shape
    # one shared center == the multi kernel with every row's center equal
    # (broadcast_to is a zero-copy view; the multi kernel transposes it
    # into its contiguous working layout anyway)
    return _dba_paths_batch_multi(
        np.broadcast_to(center, (B, r)), batch, window=window
    )


def dba_update_batch(center, batch, window=None):
    """One DBA iteration over a uniform-length member matrix: batched
    forward DP + lockstep vectorized backtrack. Numerically equivalent to
    :func:`dba_update` member-by-member (accumulation order differs only
    across members, verified ~1e-9 in tests)."""
    center = np.asarray(center, dtype=np.float64)
    batch = np.asarray(batch, dtype=np.float64)
    r = len(center)
    B, c = batch.shape
    steps, ilo_k = _dba_paths_batch(center, batch, window=window)
    sums = np.zeros(r)
    cnts = np.zeros(r)
    i = np.full(B, r, dtype=np.int64)
    j = np.full(B, c, dtype=np.int64)
    brange = np.arange(B)
    active = (i > 0) & (j > 0)
    while active.any():
        ia, ja, ba = i[active], j[active], brange[active]
        np.add.at(sums, ia - 1, batch[ba, ja - 1])
        np.add.at(cnts, ia - 1, 1.0)
        kk = ia + ja
        code = steps[kk, ia - ilo_k[kk], ba]
        i[active] = ia - (code != 2)
        j[active] = ja - (code != 1)
        active = (i > 0) & (j > 0)
    cnts[cnts == 0] = 1.0
    return sums / cnts


def dba_update_batch_weighted(center, batch, weights, window=None):
    """One WEIGHTED DBA iteration: row b contributes ``weights[b] *
    value`` to the aligned position sums and ``weights[b]`` to the
    counts — the re-merge rule for salted partial barycenters (each
    partial stands for ``weights[b]`` original members).  With all
    weights 1.0 the multiplications are exact no-ops, so this is
    bit-identical to :func:`dba_update_batch` (gated).  Weight w vs
    physically duplicating the member w times is the SAME real number
    but not the same float: the duplicate's repeated adds round once
    per add while the weighted form rounds once per node —
    fl(s+x+x) ≠ fl(s+2x) in the last ulp (double rounding; a member's
    path revisiting a position triggers it even for a lone member) —
    so the duplication law is gated at ≤ 1e-9, not bit-equality
    (measured 7.3e-12 on the 50 257 scale)."""
    center = np.asarray(center, dtype=np.float64)
    batch = np.asarray(batch, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    r = len(center)
    B, c = batch.shape
    steps, ilo_k = _dba_paths_batch(center, batch, window=window)
    sums = np.zeros(r)
    cnts = np.zeros(r)
    i = np.full(B, r, dtype=np.int64)
    j = np.full(B, c, dtype=np.int64)
    brange = np.arange(B)
    active = (i > 0) & (j > 0)
    while active.any():
        ia, ja, ba = i[active], j[active], brange[active]
        np.add.at(sums, ia - 1, weights[ba] * batch[ba, ja - 1])
        np.add.at(cnts, ia - 1, weights[ba])
        kk = ia + ja
        code = steps[kk, ia - ilo_k[kk], ba]
        i[active] = ia - (code != 2)
        j[active] = ja - (code != 1)
        active = (i > 0) & (j > 0)
    cnts[cnts == 0] = 1.0
    return sums / cnts


def dba_batch_weighted(
    members, weights, center=None, max_it=10, thr=1e-5, window=None
):
    """Weighted DBA loop (salted-rollup re-merge).  Deterministic
    center init: the member with the LARGEST weight, first by stable
    order on ties (np.argmax) — the partial from the biggest salt
    subgroup anchors the merge."""
    members = np.asarray(members, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if center is None:
        center = members[int(np.argmax(weights))]
    center = np.asarray(center, dtype=np.float64).copy()
    for _ in range(max_it):
        new_center = dba_update_batch_weighted(
            center, members, weights, window=window
        )
        delta = float(np.max(np.abs(new_center - center)))
        center = new_center
        if delta <= thr:
            break
    return center


def dba_batch(members, center=None, max_it=10, thr=1e-5, window=None):
    """DBA loop over a (B, L) uniform-length member matrix — the rollup
    hot path. Same center-init rule as :func:`dba` (median length == the
    middle member by stable order when lengths are uniform)."""
    members = np.asarray(members, dtype=np.float64)
    B = members.shape[0]
    if center is None:
        center = members[B // 2]
    center = np.asarray(center, dtype=np.float64).copy()
    for _ in range(max_it):
        new_center = dba_update_batch(center, members, window=window)
        delta = float(np.max(np.abs(new_center - center)))
        center = new_center
        if delta <= thr:
            break
    return center


_DP_WORKSPACE = threading.local()


def _dp_buffers(r, B):
    """Three recycled (r+1, B) cost-diagonal buffers per THREAD (one
    shape at a time — the mega kernel calls with one chunk shape).
    Spark Python workers are single-threaded per task, but the cache is
    ``threading.local`` anyway so driver-side threaded callers can never
    silently share (and corrupt) a workspace. The INF re-fill below is
    required state reset; the cache only avoids the alloc + first-touch
    page faults on every call."""
    key = (r, B)
    if getattr(_DP_WORKSPACE, "key", None) != key:
        _DP_WORKSPACE.key = key
        _DP_WORKSPACE.bufs = tuple(np.empty((r + 1, B)) for _ in range(3))
    return _DP_WORKSPACE.bufs


def _dba_paths_batch_multi(centers_per_row, batch, window=None, batchT=None):
    """Forward DP where each row has its own alignment target (used to
    run many groups' DBA in ONE DP — centers_per_row[b] is row b's group
    center). Same step-code semantics and band-compressed
    ``(steps, ilo_k)`` return as :func:`_dba_paths_batch`.

    ``batchT``: optional precomputed ``ascontiguousarray(batch.T)`` so
    a caller iterating with an unchanged batch pays the transpose once."""
    B, r = centers_per_row.shape
    c = batch.shape[1]
    ilo_a, ihi_a = _band_bounds(r, c, window)
    bw = int(max(1, (ihi_a - ilo_a + 1).max()))
    # transposed working layout: DP state is (position, member) so every
    # band slice is a block of CONTIGUOUS rows of B values — the k-loop
    # then runs entirely on contiguous memory (the (member, position)
    # layout made every operand a strided column gather)
    centersT = np.ascontiguousarray(centers_per_row.T)  # (r, B)
    if batchT is None:
        batchT = np.ascontiguousarray(batch.T)  # (c, B)
    # np.empty, not zeros: the backtrack only ever reads in-band cells,
    # all of which are written below (s_k[:] = 2 covers the band width)
    steps = np.empty((r + c + 1, bw, B), dtype=np.uint8)
    ilo_k = np.zeros(r + c + 1, dtype=np.int64)
    ilo_k[1:] = ilo_a
    d_km2, d_km1, d_cur = _dp_buffers(r, B)
    d_km2[:] = INF
    d_km1[:] = INF
    d_cur[:] = INF
    d_km1[0, :] = 0.0
    for k in range(1, r + c + 1):
        d_k = d_cur
        ilo = int(ilo_a[k - 1])
        ihi = int(ihi_a[k - 1])
        if ilo <= ihi:
            # clear stale values the recycled buffer may hold just left
            # of the band (band bounds only move right — see _band_bounds)
            d_k[max(0, ilo - 2) : ilo, :] = INF
            cost = centersT[ilo - 1 : ihi] - batchT[k - ihi - 1 : k - ilo][::-1]
            cost *= cost
            diag = d_km2[ilo - 1 : ihi]
            up = d_km1[ilo - 1 : ihi]
            left = d_km1[ilo : ihi + 1]
            take_diag = (diag <= up) & (diag <= left)
            take_up = (~take_diag) & (up <= left)
            best = np.minimum(np.minimum(diag, up), left)
            cost += best
            d_k[ilo : ihi + 1] = cost
            # codes 0/1/2 (diag/up/left) in one uint8 expression
            w_ = ihi - ilo + 1
            s_k = steps[k, :w_]
            s_k[:] = 2
            s_k -= take_up.view(np.uint8)
            s_k -= 2 * take_diag.view(np.uint8)
        else:  # empty band (degenerate window): nothing valid on this diag
            d_k[:] = INF
        d_km2, d_km1, d_cur = d_km1, d_k, d_km2
    return steps, ilo_k


def dba_batch_groups(members, group_idx, n_groups, max_it=10, thr=1e-5, window=None):
    """DBA for MANY groups in one shared DP: ``members`` is the (B, L)
    stack of all groups' members (groups contiguous, stable member order),
    ``group_idx`` maps each row to its group. Returns (n_groups, L)
    centers.

    Bit-identical to running :func:`dba_batch` per group (per-(group,
    position) accumulation order is preserved), but the anti-diagonal loop
    overhead is paid once per chunk instead of once per group — this is
    the rollup hot-path kernel.
    """
    members = np.asarray(members, dtype=np.float64)
    group_idx = np.asarray(group_idx, dtype=np.int64)
    B, L = members.shape
    # per-group init: middle member by stable order
    centers = np.empty((n_groups, L))
    starts = np.searchsorted(group_idx, np.arange(n_groups), side="left")
    ends = np.searchsorted(group_idx, np.arange(n_groups), side="right")
    sizes = ends - starts
    centers[:] = members[starts + sizes // 2]
    active = np.ones(n_groups, dtype=bool)
    brange = np.arange(B)
    prev_mask = None
    mb = gb = mbT = None
    for _ in range(max_it):
        row_active = active[group_idx]
        if prev_mask is None or not np.array_equal(row_active, prev_mask):
            # all-active (the common case before convergence) needs no copy
            if row_active.all():
                mb, gb = members, group_idx
            else:
                mb = members[row_active]
                gb = group_idx[row_active]
            mbT = np.ascontiguousarray(mb.T)
            prev_mask = row_active.copy()
        steps, ilo_k = _dba_paths_batch_multi(
            centers[gb], mb, window=window, batchT=mbT
        )
        sums = np.zeros((n_groups, L))
        cnts = np.zeros((n_groups, L))
        nb = mb.shape[0]
        i = np.full(nb, L, dtype=np.int64)
        j = np.full(nb, L, dtype=np.int64)
        rrange = np.arange(nb)
        alive = (i > 0) & (j > 0)
        while alive.any():
            ia, ja, ra = i[alive], j[alive], rrange[alive]
            ga = gb[ra]
            np.add.at(sums, (ga, ia - 1), mb[ra, ja - 1])
            np.add.at(cnts, (ga, ia - 1), 1.0)
            kk = ia + ja
            code = steps[kk, ia - ilo_k[kk], ra]
            i[alive] = ia - (code != 2)
            j[alive] = ja - (code != 1)
            alive = (i > 0) & (j > 0)
        cnts[cnts == 0] = 1.0
        new_centers = sums / cnts
        for g in np.nonzero(active)[0]:
            delta = float(np.max(np.abs(new_centers[g] - centers[g])))
            centers[g] = new_centers[g]
            if delta <= thr:
                active[g] = False
        if not active.any():
            break
    return centers


def dtw_distance_batch(
    query, batch, lengths, window=None, psi=None, max_dist=None,
    penalty=None, max_step=None, abandon_every=8,
):
    """DTW distance from ``query`` (len r) to each row of ``batch``
    (shape (B, c_pad), padded), with true lengths ``lengths``.

    Returns float64 array (B,). Matches :func:`dtw_distance`
    (squared-euclidean inner, sqrt at the end) for each pair, including
    ``penalty`` (additive cost on compress/expand moves, squared like
    the scalar kernel) and ``max_step`` (per-step cost cap -> INF).

    ``max_dist`` enables BATCH early abandoning (the PrunedDTW idea
    lifted to the whole batch): members whose last two anti-diagonals
    both exceed ``max_dist²`` everywhere can never recover (costs only
    accumulate), so every ``abandon_every`` steps dead rows are
    compacted out of the DP and reported as INF — exactly the scalar
    kernel's early-abandon result. Only applied with zero psi: a
    psi-relaxed final can use boundary cells captured BEFORE a member
    went dead, which the two-diagonal liveness test cannot see.
    """
    query = np.asarray(query, dtype=np.float64)
    batch = np.asarray(batch, dtype=np.float64)
    lengths = np.asarray(lengths, dtype=np.int64)
    B, c_pad = batch.shape
    r = len(query)
    psi_1b, psi_1e, psi_2b, psi_2e = _resolve_psi(psi)
    if window is None or window <= 0:
        win = max(r, int(lengths.max()))
    else:
        win = window
    md2 = None
    if max_dist is not None and not (psi_1b or psi_1e or psi_2b or psi_2e):
        md2 = float(max_dist) * float(max_dist)
    pen = 0.0 if penalty is None else float(penalty) * float(penalty)
    ms2 = INF if max_step is None else float(max_step) * float(max_step)
    # per-member band params
    mrc = np.maximum(0, r - lengths)
    mcr = np.maximum(0, lengths - r)
    a = mrc + win - 1  # j >= i - a
    b = mcr + win - 1  # j <= i + b
    # global anti-diagonal bounds from the WIDEST member band (superset
    # of every member's band, so narrowing skips only always-INF cells —
    # bit-identical results, ~(L/2w)x less work at small windows)
    a_max = int(a.max())
    b_max = int(b.max())

    d_km2 = np.full((B, r + 1), INF)
    d_km1 = np.full((B, r + 1), INF)  # diag 0 at k=1
    d_km1[:, 0] = 0.0
    last_row = np.full((B, c_pad + 1), INF)  # D[r, j]
    last_col = np.full((B, r + 1), INF)  # D[i, c_m] per member
    I_full = np.arange(r + 1)
    out_full = np.full(B, INF)
    active = np.arange(B)
    for k in range(1, r + c_pad + 1):
        d_k = np.full((B, r + 1), INF)
        if k <= c_pad:
            d_k[:, 0] = np.where(
                (k <= lengths) & (k <= psi_2b), 0.0, INF
            )  # cell (0, k) valid only if k <= c_m
        if k <= r:
            d_k[:, k] = 0.0 if k <= psi_1b else INF
        # member band: j_seq in [i_seq - a_m, i_seq + b_m] with cell
        # (i_seq, j_seq) = (I-1, k-I-1) gives I in
        # [ceil((k-b_m)/2), floor((k+a_m)/2)] — bound by the widest member
        ilo = max(1, k - c_pad, -((-(k - b_max)) // 2))
        ihi = min(r, k - 1, (k + a_max) // 2)
        if ilo <= ihi:
            I = I_full[ilo : ihi + 1]
            x = query[I - 1]  # (n,)
            y = batch[:, k - I - 1]  # (B, n) ; j = k - I - 1
            cost = x[None, :] - y
            cost *= cost
            if ms2 != INF:
                cost = np.where(cost > ms2, INF, cost)
            diag = d_km2[:, I - 1]
            up = d_km1[:, I - 1] + pen
            left = d_km1[:, I] + pen
            vals = cost + np.minimum(diag, np.minimum(up, left))
            # mask: j must be within [0, c_m) and within band [i - a, i + b]
            j = k - I - 1  # (n,)
            i0 = I - 1
            valid = (
                (j[None, :] < lengths[:, None])
                & (j[None, :] >= (i0[None, :] - a[:, None]))
                & (j[None, :] <= (i0[None, :] + b[:, None]))
            )
            d_k[:, ilo : ihi + 1] = np.where(valid, vals, INF)
        if 0 <= k - r <= c_pad:
            last_row[:, k - r] = d_k[:, r]
        # capture column c_m per member: i = k - c_m in [0, r]
        im = k - lengths
        sel = (im >= 0) & (im <= r)
        if sel.any():
            bs = np.nonzero(sel)[0]
            last_col[bs, im[bs]] = d_k[bs, im[bs]]
        d_km2, d_km1 = d_km1, d_k
        if md2 is not None and k % abandon_every == 0 and k < r + c_pad:
            rolling_min = np.minimum(d_km1.min(axis=1), d_km2.min(axis=1))
            # members past their bottom-right corner are FINISHED (psi=0
            # result sits in last_row) — finalize and drop them together
            # with the dead ones
            finished = k >= (r + lengths)
            dead = (rolling_min > md2) & ~finished
            drop = dead | finished
            if drop.any() and drop.mean() > 0.25:
                for m in np.nonzero(finished)[0]:
                    v = last_row[m, lengths[m]]
                    # scalar-kernel parity: a finished member whose final
                    # cost exceeds max_dist² reports INF, exactly like
                    # dtw_distance's best > md check
                    out_full[active[m]] = INF if v > md2 else v
                keep = ~drop
                batch = batch[keep]
                lengths = lengths[keep]
                a, b = a[keep], b[keep]
                if len(a):
                    a_max = int(a.max())
                    b_max = int(b.max())
                d_km1, d_km2 = d_km1[keep], d_km2[keep]
                last_row, last_col = last_row[keep], last_col[keep]
                active = active[keep]
                B = len(active)
                if B == 0:
                    return np.sqrt(out_full)
    # final value per member
    for m in range(B):
        cm = int(lengths[m])
        if psi_1e == 0 and psi_2e == 0:
            best = last_row[m, cm]
        else:
            best = min(
                np.min(last_row[m, max(0, cm - psi_2e) : cm + 1]),
                np.min(last_col[m, max(0, r - psi_1e) :]),
            )
        if md2 is not None and best > md2:
            best = INF  # scalar-kernel parity (dtw_distance's best > md)
        out_full[active[m]] = best
    return np.sqrt(out_full)


# ---------------------------------------------------------------------------
# K7 — dependent multivariate DTW (ref:dtaidistance/dtw_ndim.py::distance)
# ---------------------------------------------------------------------------


def dtw_ndim_distance(s1, s2, window=None, max_dist=None, psi=None):
    """Dependent multivariate DTW: inner cost of cell (i, j) is the sum
    over dimensions of squared differences (one warping path shared by
    all dimensions), sqrt at the end — the semantics of
    ``ref:dtaidistance/dtw_ndim.py::distance``.

    ``s1``/``s2``: (n, d) arrays. Plain two-row DP (clarity over speed:
    the batched hot paths are univariate; ndim is an API-parity op).
    """
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    if s1.ndim == 1:
        s1 = s1[:, None]
    if s2.ndim == 1:
        s2 = s2[:, None]
    r, c = len(s1), len(s2)
    if r == 0 or c == 0:
        return INF
    md = INF if max_dist is None else max_dist * max_dist
    psi_1b, psi_1e, psi_2b, psi_2e = _resolve_psi(psi)
    window, a, b = _band_params(r, c, window)
    prev = np.full(c + 1, INF)
    prev[0] = 0.0
    prev[1 : psi_2b + 1] = 0.0
    last_col = np.full(r + 1, INF)
    last_col[0] = prev[c]
    for i in range(1, r + 1):
        cur = np.full(c + 1, INF)
        if i <= psi_1b:
            cur[0] = 0.0
        jlo = max(1, i - a)
        jhi = min(c, i + b)
        if jlo <= jhi:
            J = np.arange(jlo, jhi + 1)
            diff = s1[i - 1][None, :] - s2[J - 1]
            cost = np.einsum("ij,ij->i", diff, diff)
            # left neighbor depends on the current row: sequential inner loop
            for idx, j in enumerate(J):
                v = cost[idx] + min(prev[j - 1], prev[j], cur[j - 1])
                if v <= md:
                    cur[j] = v
        prev = cur
        last_col[i] = cur[c]
    if psi_1e == 0 and psi_2e == 0:
        best = prev[c]
    else:
        best = min(
            np.min(prev[max(0, c - psi_2e) : c + 1]),
            np.min(last_col[max(0, r - psi_1e) : r + 1]),
        )
    return math.sqrt(best) if best <= md else INF


def dtw_ndim_warping_paths(s1, s2, window=None, max_dist=None, psi=None):
    """Full accumulated-cost matrix for dependent multivariate DTW
    (``ref:dtaidistance/dtw_ndim.py::warping_paths``): inner cost of
    cell (i, j) is the squared L2 distance between the d-dim points,
    one shared warping path across dimensions, sqrt'ed matrix returned
    (mirroring the univariate :func:`warping_paths` contract).

    Returns ``(distance, matrix)`` with ``matrix`` shaped
    ``(len(s1)+1, len(s2)+1)``; feed it to :func:`best_path`.
    """
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    if s1.ndim == 1:
        s1 = s1[:, None]
    if s2.ndim == 1:
        s2 = s2[:, None]
    r, c = len(s1), len(s2)
    md = INF if max_dist is None else max_dist * max_dist
    psi_1b, psi_1e, psi_2b, psi_2e = _resolve_psi(psi)
    window, a, b = _band_params(r, c, window)
    matrix = np.full((r + 1, c + 1), INF)
    matrix[0, 0] = 0.0
    matrix[0, 1 : psi_2b + 1] = 0.0
    matrix[1 : psi_1b + 1, 0] = 0.0
    for i in range(1, r + 1):
        jlo = max(1, i - a)
        jhi = min(c, i + b)
        if jlo <= jhi:
            J = np.arange(jlo, jhi + 1)
            diff = s1[i - 1][None, :] - s2[J - 1]
            cost = np.einsum("ij,ij->i", diff, diff)
            for idx, j in enumerate(J):
                v = cost[idx] + min(
                    matrix[i - 1, j - 1], matrix[i - 1, j], matrix[i, j - 1]
                )
                if v <= md:
                    matrix[i, j] = v
    if psi_1e == 0 and psi_2e == 0:
        best = matrix[r, c]
    else:
        best = min(
            np.min(matrix[r, max(0, c - psi_2e) : c + 1]),
            np.min(matrix[max(0, r - psi_1e) : r + 1, c]),
        )
    matrix = np.sqrt(matrix)
    return (math.sqrt(best) if best != INF else INF), matrix


def dtw_ndim_warping_path(from_s, to_s, **kwargs):
    """Optimal path between two multivariate series
    (``ref:dtaidistance/dtw_ndim.py::warping_path``)."""
    _, m = dtw_ndim_warping_paths(from_s, to_s, **kwargs)
    return best_path(m)


def dtw_weighted_distance(s1, s2, weights=None, window=None, max_dist=None):
    """Weighted DTW (C5, ``ref:dtaidistance/dtw_weighted.py::distance``
    — the kernel half; the decision-tree weight *learning* upstream
    layers on top lives in :mod:`dtaidistance_spark.weightlearn`).

    ``weights``: (len(s1), 4) array of per-index piecewise-linear
    rectifiers (x_neg, w_neg, x_pos, w_pos) applied to the residual
    d = s1[i] - s2[j] before squaring::

        a = |d|; (x, w) = (x_neg, w_neg) if d < 0 else (x_pos, w_pos)
        inner = 0           if a <= x     (dead zone)
                (w*(a-x))²  otherwise     (reweighted residual)

    so small deviations inside the learned band cost nothing and
    deviations outside are scaled per side. ``weights=None`` or the
    identity weights (x=0, w=1) reduce inner to d² — bit-identical to
    :func:`dtw_distance` (the property gate in tests). [VERIFY] exact
    column convention against the reference once the mount is populated;
    written from the public API surface (weights shape (n, 4), per-side
    dead-zone + slope) with the identity-reduction contract as the
    invariant that must survive reconciliation.

    Plain two-row DP with the shared band machinery (explainability /
    API-parity op; the batched hot paths stay univariate-unweighted).
    """
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    r, c = len(s1), len(s2)
    if r == 0 or c == 0:
        return INF
    if weights is None:
        return dtw_distance(s1, s2, window=window, max_dist=max_dist)
    w = np.asarray(weights, dtype=np.float64)
    if w.shape != (r, 4):
        raise ValueError(f"weights shape {w.shape} != ({r}, 4)")
    md = INF if max_dist is None else max_dist * max_dist
    window, a, b = _band_params(r, c, window)
    prev = np.full(c + 1, INF)
    prev[0] = 0.0
    for i in range(1, r + 1):
        cur = np.full(c + 1, INF)
        jlo = max(1, i - a)
        jhi = min(c, i + b)
        if jlo <= jhi:
            J = np.arange(jlo, jhi + 1)
            d = s1[i - 1] - s2[J - 1]
            neg = d < 0
            x = np.where(neg, w[i - 1, 0], w[i - 1, 2])
            ww = np.where(neg, w[i - 1, 1], w[i - 1, 3])
            aa = np.abs(d)
            resid = np.maximum(aa - x, 0.0) * ww
            cost = resid * resid
            for idx, j in enumerate(J):
                v = cost[idx] + min(prev[j - 1], prev[j], cur[j - 1])
                if v <= md:
                    cur[j] = v
        prev = cur
    best = prev[c]
    return math.sqrt(best) if best <= md else INF


# ---------------------------------------------------------------------------
# P6 — Needleman-Wunsch global alignment for discrete token sequences
# (ref:dtaidistance/alignment.py::needleman_wunsch / ::best_alignment)
# ---------------------------------------------------------------------------


def needleman_wunsch(s1, s2, match=1.0, mismatch=-1.0, gap=-1.0):
    """Global alignment score matrix for two discrete sequences.

    Returns (score, matrix). The reference builds this on its
    warping-paths machinery with a substitution function; semantics here
    are the classic NW recurrence (maximize), which is what its default
    substitution reduces to.
    """
    s1 = list(s1)
    s2 = list(s2)
    r, c = len(s1), len(s2)
    m = np.zeros((r + 1, c + 1))
    m[:, 0] = np.arange(r + 1) * gap
    m[0, :] = np.arange(c + 1) * gap
    for i in range(1, r + 1):
        sub = np.where(
            np.asarray([x == s1[i - 1] for x in s2]), match, mismatch
        )
        for j in range(1, c + 1):
            m[i, j] = max(
                m[i - 1, j - 1] + sub[j - 1],
                m[i - 1, j] + gap,
                m[i, j - 1] + gap,
            )
    return float(m[r, c]), m


def best_alignment(matrix, s1, s2, match=1.0, mismatch=-1.0, gap=-1.0):
    """Backtrack one optimal NW alignment: list of (i, j) pairs with -1
    marking a gap on that side. Diagonal preferred on ties."""
    i, j = len(s1), len(s2)
    path = []
    while i > 0 or j > 0:
        if i > 0 and j > 0:
            sub = match if s1[i - 1] == s2[j - 1] else mismatch
            if matrix[i, j] == matrix[i - 1, j - 1] + sub:
                path.append((i - 1, j - 1))
                i, j = i - 1, j - 1
                continue
        if i > 0 and matrix[i, j] == matrix[i - 1, j] + gap:
            path.append((i - 1, -1))
            i -= 1
            continue
        path.append((-1, j - 1))
        j -= 1
    path.reverse()
    return path


# ---------------------------------------------------------------------------
# S2 — smoothing (ref:dtaidistance/preprocessing.py::smoothing); the
# reference uses a scipy Butterworth low-pass — scipy isn't a dependency
# here, so the engine ships the centered-moving-average low-pass, which
# is SQL-expressible (window AVG) and therefore oracle-checkable.
# ---------------------------------------------------------------------------


def smoothing(s, window: int = 5):
    """Centered moving average with shrinking edges (matches SQL
    ``AVG() OVER (ROWS BETWEEN w PRECEDING AND w FOLLOWING)``)."""
    s = np.asarray(s, dtype=np.float64)
    n = len(s)
    half = window // 2
    csum = np.concatenate([[0.0], np.cumsum(s)])
    lo = np.maximum(0, np.arange(n) - half)
    hi = np.minimum(n, np.arange(n) + half + 1)
    return (csum[hi] - csum[lo]) / (hi - lo)


def butter2_lowpass(wn: float):
    """2nd-order Butterworth low-pass ``(b, a)`` at normalized cutoff
    ``wn`` (fraction of Nyquist, 0 < wn < 1) — the dependency-free
    equivalent of ``scipy.signal.butter(2, wn)`` via the standard
    bilinear transform of the analog prototype s² + √2·s + 1 with
    frequency pre-warp K = tan(π·wn/2). Unity DC gain by construction
    (sum(b) == sum(a)). Coefficients match scipy's published values
    (gated in tests/test_kernels.py on butter(2, 0.2))."""
    if not 0.0 < wn < 1.0:
        raise ValueError(f"normalized cutoff must be in (0, 1), got {wn}")
    k = math.tan(math.pi * wn / 2.0)
    k2 = k * k
    sq2 = math.sqrt(2.0)
    d = 1.0 + sq2 * k + k2
    b = np.array([k2 / d, 2.0 * k2 / d, k2 / d])
    a = np.array([1.0, 2.0 * (k2 - 1.0) / d, (1.0 - sq2 * k + k2) / d])
    return b, a


def lfilter(b, a, x, zi=None):
    """IIR filter in direct form II transposed (the
    ``scipy.signal.lfilter`` recurrence): ``y[n] = b0·x[n] + z1[n-1]``,
    ``zi[n] = b[i+1]·x[n] − a[i+1]·y[n] + z[i+1][n-1]``. Returns
    ``(y, zf)`` when ``zi`` is given, else ``y``. Scalar Python loop —
    the per-series regime (rollup-sized arrays), not a hot batch path."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    if a[0] != 1.0:
        b, a = b / a[0], a / a[0]
    order = max(len(a), len(b)) - 1
    if order == 0:
        y = b[0] * x
        return (y, np.zeros(0)) if zi is not None else y
    bb = np.zeros(order + 1)
    aa = np.zeros(order + 1)
    bb[: len(b)] = b
    aa[: len(a)] = a
    z = np.zeros(order) if zi is None else np.asarray(zi, np.float64).copy()
    y = np.empty_like(x)
    for n in range(len(x)):
        xn = x[n]
        yn = bb[0] * xn + z[0]
        for i in range(order - 1):
            z[i] = bb[i + 1] * xn - aa[i + 1] * yn + z[i + 1]
        z[order - 1] = bb[order] * xn - aa[order] * yn
        y[n] = yn
    return (y, z) if zi is not None else y


def lfilter_zi(b, a):
    """Steady-state initial filter delay values (``scipy.signal.
    lfilter_zi``): solve (I − Aᵀ)·zi = b[1:] − a[1:]·b[0] where A is the
    companion matrix of the (monic) denominator — filtering a constant
    c with ``zi=zi*c`` then yields exactly c from the first sample."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    if a[0] != 1.0:
        b, a = b / a[0], a / a[0]
    n = max(len(a), len(b))
    aa = np.zeros(n)
    bb = np.zeros(n)
    aa[: len(a)] = a
    bb[: len(b)] = b
    comp_t = np.zeros((n - 1, n - 1))
    comp_t[:, 0] = -aa[1:]
    comp_t[: n - 2, 1:] = np.eye(n - 2)
    rhs = bb[1:] - aa[1:] * bb[0]
    return np.linalg.solve(np.eye(n - 1) - comp_t, rhs)


def filtfilt(b, a, x):
    """Zero-phase forward-backward filtering with odd end extension and
    steady-state initial conditions — the ``scipy.signal.filtfilt``
    default recipe (padtype='odd', padlen=3·max(len(a), len(b)),
    method='pad'): no phase shift, squared magnitude response."""
    x = np.asarray(x, dtype=np.float64)
    padlen = 3 * max(len(a), len(b))
    if len(x) <= padlen:
        raise ValueError(
            f"filtfilt needs len(x) > {padlen}, got {len(x)}"
        )
    ext = np.concatenate(
        [2.0 * x[0] - x[padlen:0:-1], x, 2.0 * x[-1] - x[-2 : -padlen - 2 : -1]]
    )
    zi = lfilter_zi(b, a)
    y, _ = lfilter(b, a, ext, zi=zi * ext[0])
    y, _ = lfilter(b, a, y[::-1], zi=zi * y[-1])
    y = y[::-1]
    return y[padlen : len(y) - padlen]


def smoothing_butterworth(s, smooth: float):
    """S2, upstream-true: ``ref:dtaidistance/preprocessing.py::
    smoothing`` applies ``filtfilt(butter(2, 2·smooth))`` per series
    (cutoff = fs·smooth over Nyquist = fs/2). ``smooth`` ∈ (0, 0.5);
    series shorter than the filtfilt pad (10 points at order 2) raise,
    as upstream's scipy call does. The moving-average :func:`smoothing`
    remains the SQL-oracle-able window form; this is the numerically
    upstream-faithful one."""
    s = np.asarray(s, dtype=np.float64)
    if not 0.0 < smooth < 0.5:
        raise ValueError(f"smooth must be in (0, 0.5), got {smooth}")
    b, a = butter2_lowpass(2.0 * smooth)
    try:
        return filtfilt(b, a, s)
    except ValueError as exc:
        raise ValueError(
            "Cannot apply smoothing: series too short for the filter "
            "pad; use a longer series or no smoothing"
        ) from exc


# ---------------------------------------------------------------------------
# M6 — local concurrences (ref:dtaidistance/subsequence/dtw.py::
# local_concurrences / ref:dtaidistance/dtw.py::warping_paths_affinity).
# LoCo-style: exponential affinity rewards, Smith-Waterman-style local
# accumulation (floor at 0), greedy extraction of non-overlapping paths.
# Parameterization follows the public upstream surface (gamma, tau,
# delta, delta_factor, penalty); exact upstream DP constants are
# [VERIFY]-gated on a populated reference mount (SURVEY citation note).
# ---------------------------------------------------------------------------


def warping_paths_affinity(
    s1, s2, gamma=1.0, tau=0.0, delta=0.0, delta_factor=1.0, penalty=0.0,
    diag_band=0,
):
    """Accumulated affinity matrix A (r+1, c+1): cell reward is
    exp(-(x-y)^2/gamma) when >= tau else the (negative) ``delta``
    scaled contribution; accumulation is local (floored at 0) with
    ``penalty`` on non-diagonal moves.

    ``diag_band`` > 0 zeroes cells with |i-j| < diag_band INSIDE the
    recurrence — required for self-similarity, where the trivial main
    diagonal would otherwise accumulate max affinity and leak into
    nearby lags through warp moves."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    r, c = len(s1), len(s2)
    A = np.zeros((r + 1, c + 1))
    for i in range(1, r + 1):
        d = s1[i - 1] - s2
        sim = np.exp(-(d * d) / gamma)
        prev = np.maximum(
            A[i - 1, :-1], np.maximum(A[i - 1, 1:] - penalty, 0.0)
        )
        # left-neighbor in the same row: sequential
        row = A[i]
        for j in range(1, c + 1):
            if diag_band and abs(i - j) < diag_band:
                row[j] = 0.0
                continue
            best = max(prev[j - 1], row[j - 1] - penalty)
            if sim[j - 1] >= tau:
                row[j] = best + sim[j - 1]
            else:
                row[j] = max(0.0, delta_factor * best + delta)
    return A


def local_concurrences(
    s1, s2=None, gamma=1.0, tau=0.5, delta=-1.0, delta_factor=0.5,
    penalty=0.0, min_len=3, k=5, diag_band=None,
):
    """Best non-overlapping local alignment paths between ``s1`` and
    ``s2`` (self-similarity / motif discovery when s2 is None — a band
    around the trivial main diagonal is excluded inside the DP then).
    Returns a list of dicts (score, path) strongest first; rows/cols of
    an extracted path are masked before the next extraction
    (endpoint-level non-overlap)."""
    self_mode = s2 is None
    if diag_band is None:
        diag_band = 5 if self_mode else 0
    s2v = s1 if self_mode else s2
    A = warping_paths_affinity(
        s1, s2v, gamma=gamma, tau=tau, delta=delta,
        delta_factor=delta_factor, penalty=penalty, diag_band=diag_band,
    )
    r, c = len(np.asarray(s1)), len(np.asarray(s2v))
    out = []
    used_r = np.zeros(r + 1, dtype=bool)
    used_c = np.zeros(c + 1, dtype=bool)
    work = A.copy()
    if self_mode:
        work[np.tril_indices(min(work.shape[0], work.shape[1]))] = 0.0
    for _ in range(k):
        idx = np.unravel_index(np.argmax(work), work.shape)
        score = work[idx]
        if score <= 0:
            break
        i, j = idx
        path = []
        while i > 0 and j > 0 and A[i, j] > 0:
            path.append((i - 1, j - 1))
            d, u, l = A[i - 1, j - 1], A[i - 1, j], A[i, j - 1]
            if d >= u and d >= l:
                i, j = i - 1, j - 1
            elif u >= l:
                i -= 1
            else:
                j -= 1
        path.reverse()
        if len(path) >= min_len:
            out.append({"score": float(score), "path": path})
        for pi, pj in path:
            used_r[pi + 1] = True
            used_c[pj + 1] = True
        work[used_r, :] = 0.0
        work[:, used_c] = 0.0
    return out


def mk_s_stat(v) -> int:
    """Mann-Kendall S = sum_{i<j} sign(v_j - v_i) in O(n log^2 n) by
    merge counting (the TS14 SCALE kernel; the verification tier spells
    the O(n^2) pair sum as SQL HOFs — tests/test_kernels.py gates the
    two equal on random tied inputs).

    Bottom-up mergesort over the TIME order: when merging adjacent
    sorted blocks L (earlier) and R (later), every r in R adds
    (|L < r| - |L > r|) to S via two vectorized searchsorted calls;
    within-block pairs were counted at smaller widths. Exact integer —
    no estimator anywhere."""
    arr = np.asarray(v, dtype=np.float64).copy()
    n = arr.size
    s = 0
    width = 1
    while width < n:
        for lo in range(0, n - width, 2 * width):
            mid = lo + width
            hi = min(lo + 2 * width, n)
            left = arr[lo:mid]
            right = arr[mid:hi]
            s += int(np.searchsorted(left, right, side="left").sum())
            s -= int(
                (left.size - np.searchsorted(left, right, side="right")).sum()
            )
            arr[lo:hi] = np.sort(arr[lo:hi], kind="mergesort")
        width *= 2
    return s


def mk_tied_pairs(v) -> int:
    """Number of (i < j) pairs with v_i == v_j: sum of C(m, 2) over the
    value multiplicities — O(n log n), exactly the HOF pair count."""
    _, counts = np.unique(np.asarray(v, dtype=np.float64), return_counts=True)
    return int((counts * (counts - 1) // 2).sum())
