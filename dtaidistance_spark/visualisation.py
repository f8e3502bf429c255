"""Dependency-free SVG rendering for the visualisation surface
(``ref:dtaidistance/dtw_visualisation.py::plot_warping`` /
``plot_warpingpaths`` and ``ref:dtaidistance/clustering/hierarchical.py
::LinkageTree.plot``): matplotlib is not in this container, so the
plots are emitted as standalone SVG documents — every browser and
notebook renders them, and they are exactly-testable (XML with known
element counts and coordinates) instead of pixel-fuzzy.

All functions return the SVG string; pass ``filename=`` to also write
it. Driver-side, post-aggregation small-N tooling (like the dendrogram
exports) — the distributed engine produces the matrices/paths, this
module only draws them.
"""

from __future__ import annotations

import math

import numpy as np

_HEADER = (
    '<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
    'viewBox="0 0 {w} {h}">'
)


def _finite(a: np.ndarray) -> np.ndarray:
    return a[np.isfinite(a)]


def _scale(v, lo, hi, out_lo, out_hi):
    if hi <= lo:
        return (out_lo + out_hi) / 2.0
    return out_lo + (v - lo) * (out_hi - out_lo) / (hi - lo)


def _polyline(xs, ys, stroke, width=1.5):
    pts = " ".join(f"{x:.2f},{y:.2f}" for x, y in zip(xs, ys))
    return (
        f'<polyline fill="none" stroke="{stroke}" '
        f'stroke-width="{width}" points="{pts}"/>'
    )


def _maybe_write(svg: str, filename: str | None) -> str:
    if filename:
        with open(filename, "w", encoding="utf-8") as fh:
            fh.write(svg)
    return svg


def plot_warping(s1, s2, path=None, filename=None, width=640, height=320,
                 window=None):
    """Two stacked series with gray alignment segments for every
    warping-path pair — the ``plot_warping`` layout. ``path`` defaults
    to the banded-DTW best path computed by the production kernel."""
    from dtaidistance_spark import kernels as K

    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    if path is None:
        _, m = K.warping_paths(s1, s2, window=window)
        path = K.best_path(m)
    pad, gap = 20.0, 40.0
    lane_h = (height - 2 * pad - gap) / 2.0
    lo = min(s1.min(), s2.min())
    hi = max(s1.max(), s2.max())
    x1 = [
        _scale(i, 0, max(len(s1) - 1, 1), pad, width - pad)
        for i in range(len(s1))
    ]
    x2 = [
        _scale(j, 0, max(len(s2) - 1, 1), pad, width - pad)
        for j in range(len(s2))
    ]
    y1 = [_scale(v, lo, hi, pad + lane_h, pad) for v in s1]
    y2 = [
        _scale(v, lo, hi, height - pad, height - pad - lane_h) for v in s2
    ]
    parts = [_HEADER.format(w=width, h=height)]
    for i, j in path:
        parts.append(
            f'<line class="warp" x1="{x1[i]:.2f}" y1="{y1[i]:.2f}" '
            f'x2="{x2[j]:.2f}" y2="{y2[j]:.2f}" stroke="#bbbbbb" '
            f'stroke-width="0.8"/>'
        )
    parts.append(_polyline(x1, y1, "#1f77b4"))
    parts.append(_polyline(x2, y2, "#d62728"))
    parts.append("</svg>")
    return _maybe_write("".join(parts), filename)


def plot_warpingpaths(s1, s2, paths=None, path=None, filename=None,
                      cell: float = 6.0, window=None):
    """Accumulated-cost-matrix heatmap with the best path overlaid —
    the ``plot_warpingpaths`` layout (series margins along both axes,
    grayscale cells, red path). ``paths`` defaults to the kernel's
    accumulated matrix (shape (len(s1)+1, len(s2)+1); the 0-row/column
    band edge is not drawn, as upstream)."""
    from dtaidistance_spark import kernels as K

    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    if paths is None:
        _, paths = K.warping_paths(s1, s2, window=window)
    paths = np.asarray(paths, dtype=np.float64)
    if path is None:
        path = K.best_path(paths)
    r, c = paths.shape[0] - 1, paths.shape[1] - 1
    margin = 6.0 * cell
    w = margin + c * cell + cell
    h = margin + r * cell + cell
    body = _finite(paths[1:, 1:])
    lo = float(body.min()) if body.size else 0.0
    hi = float(body.max()) if body.size else 1.0
    parts = [_HEADER.format(w=f"{w:.0f}", h=f"{h:.0f}")]
    # heatmap cells (light = cheap, dark = costly; inf = white)
    for i in range(r):
        for j in range(c):
            v = paths[i + 1, j + 1]
            if not math.isfinite(v):
                continue
            g = int(round(235 - _scale(v, lo, hi, 0.0, 200.0)))
            parts.append(
                f'<rect class="cell" x="{margin + j * cell:.1f}" '
                f'y="{margin + i * cell:.1f}" width="{cell:.1f}" '
                f'height="{cell:.1f}" fill="rgb({g},{g},{g})"/>'
            )
    # best path in red (cell centers)
    px = [margin + (j + 0.5) * cell for _i, j in path]
    py = [margin + (i + 0.5) * cell for i, _j in path]
    parts.append(_polyline(px, py, "#d62728", width=2.0))
    # series margins: s2 across the top, s1 down the left
    if len(s2) > 1:
        sx = [margin + (j + 0.5) * cell for j in range(len(s2))]
        sy = [
            _scale(v, s2.min(), s2.max(), margin - cell, 2.0) for v in s2
        ]
        parts.append(_polyline(sx, sy, "#d62728", width=1.2))
    if len(s1) > 1:
        sy = [margin + (i + 0.5) * cell for i in range(len(s1))]
        sx = [
            _scale(v, s1.min(), s1.max(), margin - cell, 2.0) for v in s1
        ]
        parts.append(_polyline(sx, sy, "#1f77b4", width=1.2))
    parts.append("</svg>")
    return _maybe_write("".join(parts), filename)


def plot_linkage(Z, labels=None, filename=None, width=480,
                 leaf_gap: float = 18.0):
    """SVG dendrogram of a scipy-Z-format linkage matrix — the
    ``LinkageTree.plot`` stand-in next to the Newick/ASCII exports.
    +inf merge heights (disconnected pruned components) are drawn at
    1.1× the max finite height with a dashed stroke."""
    Z = np.asarray(Z, dtype=np.float64)
    n = len(Z) + 1
    if labels is None:
        labels = [str(i) for i in range(n)]
    heights = Z[:, 2]
    finite = _finite(heights)
    hmax = float(finite.max()) if finite.size else 1.0
    hmax = hmax if hmax > 0 else 1.0
    draw_h = {i: (1.1 * hmax if not math.isfinite(h) else h)
              for i, h in enumerate(heights)}
    pad = 14.0
    height = 2 * pad + (n - 1) * leaf_gap + 20.0
    x_lo, x_hi = width - 120.0, pad  # root left, leaves right

    def hx(h):
        return _scale(h, 0.0, 1.1 * hmax, x_lo, x_hi) if hmax else x_lo

    # leaf order: left-to-right DFS of the merge tree for a planar layout
    children: dict[int, tuple[int, int]] = {
        n + k: (int(Z[k][0]), int(Z[k][1])) for k in range(len(Z))
    }
    order: list[int] = []

    def dfs(node):
        if node < n:
            order.append(node)
            return
        a, b = children[node]
        dfs(a)
        dfs(b)

    dfs(2 * n - 2)
    ypos = {leaf: pad + 10.0 + k * leaf_gap for k, leaf in enumerate(order)}
    xpos = {leaf: x_lo for leaf in range(n)}
    parts = [_HEADER.format(w=width, h=f"{height:.0f}")]
    for leaf in range(n):
        parts.append(
            f'<text x="{x_lo + 4:.1f}" y="{ypos[leaf] + 3:.1f}" '
            f'font-size="10" font-family="monospace">{labels[leaf]}</text>'
        )
    for k in range(len(Z)):
        a, b = children[n + k]
        x = hx(draw_h[k])
        dash = (
            ' stroke-dasharray="4,3"' if not math.isfinite(heights[k]) else ""
        )
        ya, yb = ypos[a], ypos[b]
        parts.append(
            f'<path class="merge" d="M {xpos[a]:.1f} {ya:.1f} H {x:.1f} '
            f'V {yb:.1f} H {xpos[b]:.1f}" fill="none" stroke="#333"'
            f'{dash} stroke-width="1.2"/>'
        )
        ypos[n + k] = (ya + yb) / 2.0
        xpos[n + k] = x
    parts.append("</svg>")
    return _maybe_write("".join(parts), filename)
