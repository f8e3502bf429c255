"""Weight LEARNING for weighted DTW — the explainability half of C5
(``ref:dtaidistance/dtw_weighted.py::compute_weights_using_dt`` /
``series_to_dt`` / ``DecisionTreeClassifier``), written from the public
API surface: learn, from labeled series, per-index dead-zone + slope
weights (the (n, 4) convention of
:func:`dtaidistance_spark.kernels.dtw_weighted_distance`) such that
deviations at class-discriminative prototype indices are penalized and
deviations everywhere else are forgiven.

Algorithm (public upstream shape; exact upstream split/weight constants
are [VERIFY]-gated on a populated reference mount, like M6):

1. **Align**: every series warps onto the prototype with the standard
   banded DTW best path (the production kernel).
2. **Featurize** (``series_to_features``): for prototype index m, the
   per-series features are the largest deviation of aligned points
   below (feature 2m) and above (feature 2m+1) the prototype value —
   one (N, 2n) matrix.
3. **Discriminate** (``DecisionTreeClassifier``): a deterministic,
   dependency-free CART (information gain, midpoint thresholds,
   lowest-feature-index tie-break) classifies *same label as the
   prototype* vs *different*.
4. **Derive weights** (``compute_weights_using_dt``): each split that
   separates the classes donates its threshold as the dead zone ``x``
   on that index/side (same-class deviations up to the threshold cost
   nothing) and a slope ``w = 1 + gain/entropy(parent)`` beyond it
   (more informative splits punish harder). Untouched indices keep the
   identity (x=0, w=1), so a tree with no informative split degrades
   the kernel to plain DTW — the invariant the property gates pin.

Scale shape: the tree is trained driver-side on the tiny (N, 2n)
feature matrix, but featurization is one Arrow ``mapInPandas`` pass
with the prototype broadcast in the closure
(:func:`features_distributed`) — the series table never leaves the
executors, mirroring how the IVF/PQ quantizers train on a bounded
object and apply distributed.
"""

from __future__ import annotations

import math

import numpy as np

from dtaidistance_spark import kernels as K


# ---------------------------------------------------------------------------
# featurization
# ---------------------------------------------------------------------------


def deviation_features(proto: np.ndarray, series: np.ndarray,
                       window: int | None = None) -> np.ndarray:
    """One series' (2n,) feature row: per prototype index m, the largest
    aligned deviation below (2m) / above (2m+1) the prototype value,
    0.0 where no aligned point deviates on that side."""
    proto = np.asarray(proto, dtype=np.float64)
    series = np.asarray(series, dtype=np.float64)
    n = len(proto)
    out = np.zeros(2 * n)
    _, paths = K.warping_paths(proto, series, window=window)
    for i, j in K.best_path(paths):
        d = series[j] - proto[i]
        if d < 0.0:
            out[2 * i] = max(out[2 * i], -d)
        elif d > 0.0:
            out[2 * i + 1] = max(out[2 * i + 1], d)
    return out


def series_to_features(series_list, prototypeidx: int,
                       window: int | None = None) -> np.ndarray:
    """(N, 2n) deviation-feature matrix of every series vs the
    prototype (the prototype's own row is all zeros by construction and
    is kept so row indices match label indices)."""
    proto = np.asarray(series_list[prototypeidx], dtype=np.float64)
    return np.asarray(
        [deviation_features(proto, s, window=window) for s in series_list]
    )


def features_distributed(df, proto: np.ndarray, window: int | None = None,
                         id_col: str = "doc_id", value_col: str = "tokens"):
    """The same featurization as ONE Arrow ``mapInPandas`` pass with the
    prototype broadcast in the closure — (id, features array<double>)
    per series; collect only this (N, 2n) matrix, never the series."""
    import pandas as pd
    from pyspark.sql import functions as F

    p = np.asarray(proto, dtype=np.float64)
    win = window

    def kern(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        deviation_features(
                            p, np.asarray(v, np.float64), window=win
                        )
                        for v in pdf[value_col]
                    ],
                }
            )

    return (
        df.where(F.size(F.col(value_col)) > 0)
        .select(id_col, F.col(value_col).cast("array<double>").alias(value_col))
        .mapInPandas(kern, f"{id_col} string, features array<double>")
    )


# ---------------------------------------------------------------------------
# dependency-free deterministic CART
# ---------------------------------------------------------------------------


def _entropy(y: np.ndarray) -> float:
    if len(y) == 0:
        return 0.0
    p = y.mean()
    if p in (0.0, 1.0):
        return 0.0
    return -(p * math.log2(p) + (1 - p) * math.log2(1 - p))


class DecisionTreeClassifier:
    """Binary CART on continuous features: best (feature, midpoint
    threshold) by information gain, ties to the lowest feature index
    then the lowest threshold — fully deterministic, no sampling.
    Nodes are dicts ``{feature, threshold, gain, parent_entropy, left,
    right}`` or ``{leaf: class}``."""

    def __init__(self, max_depth: int = 3, min_samples_split: int = 2):
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.root: dict | None = None

    def _best_split(self, X, y):
        best = None  # (gain, feature, threshold)
        h = _entropy(y)
        if h == 0.0:
            return None
        for f in range(X.shape[1]):
            vals = np.unique(X[:, f])
            if len(vals) < 2:
                continue
            for t in (vals[:-1] + vals[1:]) / 2.0:
                mask = X[:, f] <= t
                nl = int(mask.sum())
                gain = h - (
                    nl * _entropy(y[mask]) + (len(y) - nl) * _entropy(y[~mask])
                ) / len(y)
                key = (-gain, f, t)
                if gain > 1e-12 and (best is None or key < best):
                    best = key
        if best is None:
            return None
        return (-best[0], best[1], best[2], h)

    def _grow(self, X, y, depth):
        if (
            depth >= self.max_depth
            or len(y) < self.min_samples_split
            or _entropy(y) == 0.0
        ):
            return {"leaf": int(round(y.mean())) if len(y) else 0}
        split = self._best_split(X, y)
        if split is None:
            return {"leaf": int(round(y.mean()))}
        gain, f, t, h = split
        mask = X[:, f] <= t
        return {
            "feature": int(f),
            "threshold": float(t),
            "gain": float(gain),
            "parent_entropy": float(h),
            "left": self._grow(X[mask], y[mask], depth + 1),
            "right": self._grow(X[~mask], y[~mask], depth + 1),
        }

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        self.root = self._grow(X, y, 0)
        return self

    def _predict_one(self, node, x):
        while "leaf" not in node:
            node = node["left"] if x[node["feature"]] <= node["threshold"] else node["right"]
        return node["leaf"]

    def predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        return np.asarray([self._predict_one(self.root, x) for x in X])

    def splits(self):
        """Flat list of internal nodes (preorder)."""
        out = []

        def walk(node):
            if node is None or "leaf" in node:
                return
            out.append(node)
            walk(node["left"])
            walk(node["right"])

        walk(self.root)
        return out


# ---------------------------------------------------------------------------
# weights from the tree
# ---------------------------------------------------------------------------


def weights_from_tree(tree: DecisionTreeClassifier, n: int):
    """(n, 4) kernel weights + per-index importances from the fitted
    tree: a split on feature 2m (below side) / 2m+1 (above side) with
    threshold t sets that side's dead zone to t and its slope to
    1 + gain/parent_entropy ([VERIFY] upstream's exact slope law once
    the mount is populated; the invariants — identity when no split,
    slope > 1 exactly on discriminative sides, dead zone = the learned
    same-class margin — are the stable public contract). When several
    splits hit one side, the smallest threshold and the largest slope
    win (most conservative dead zone, strongest penalty)."""
    w = np.zeros((n, 4))
    w[:, 1] = 1.0
    w[:, 3] = 1.0
    importances = np.zeros(n)
    touched = np.zeros((n, 2), dtype=bool)
    for node in tree.splits():
        f, t = node["feature"], node["threshold"]
        m, side = divmod(f, 2)  # side 0 = below, 1 = above
        rel = node["gain"] / max(node["parent_entropy"], 1e-12)
        slope = 1.0 + rel
        xcol, wcol = (0, 1) if side == 0 else (2, 3)
        if touched[m, side]:
            w[m, xcol] = min(w[m, xcol], t)
            w[m, wcol] = max(w[m, wcol], slope)
        else:
            w[m, xcol] = t
            w[m, wcol] = slope
            touched[m, side] = True
        importances[m] += node["gain"]
    return w, importances


def compute_weights_using_dt(series_list, labels, prototypeidx: int,
                             window: int | None = None, max_depth: int = 3,
                             features: np.ndarray | None = None):
    """The ``ref:dtaidistance/dtw_weighted.py::compute_weights_using_dt``
    surface: returns ``(weights (n, 4), importances (n,))`` learned from
    labeled series against the prototype. ``features`` short-circuits
    featurization (pass :func:`features_distributed` output to train on
    executor-extracted features). All-same labels (or inseparable
    features) yield the identity weights — weighted DTW then equals
    plain DTW bit-for-bit (kernel contract)."""
    labels = np.asarray(labels)
    if features is None:
        features = series_to_features(series_list, prototypeidx, window=window)
    y = (labels != labels[prototypeidx]).astype(np.int64)
    n = len(np.asarray(series_list[prototypeidx]))
    mask = np.arange(len(y)) != prototypeidx  # the all-zero self row is out
    tree = DecisionTreeClassifier(max_depth=max_depth).fit(
        features[mask], y[mask]
    )
    return weights_from_tree(tree, n)
