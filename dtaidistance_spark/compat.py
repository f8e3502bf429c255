"""dtaidistance-shaped API façade — the switching-user surface.

A user of the reference library (``kennethdevloo/dtaidistance``, a fork
of ``wannesm/dtaidistance`` v2.x) calls ``dtw.distance``,
``dtw.distance_matrix``, ``dtw_barycenter.dba``, ``ed.distance``, … .
This module exposes those entry points with the upstream names,
parameter names and return conventions, mapped onto this engine:

- array-in/array-out calls run the numpy kernels directly
  (``ref:dtaidistance/dtw.py::distance`` semantics — same defaults:
  squared-euclidean inner distance, sqrt at the end, Sakoe-Chiba
  ``window``, ``max_dist``/``max_step``/``penalty``/``psi``/
  ``use_pruning``);
- ``distance_matrix`` accepts the reference's list-of-arrays (or 2-D
  matrix) plus ``block``/``compact``/``only_triu`` and computes with
  the batched anti-diagonal kernel — the ``parallel``/``use_mp``/
  ``use_c`` flags are accepted and ignored (Spark tasks replace
  OpenMP/multiprocessing; pure numpy replaces the C core);
- a DataFrame in place of the series list routes to the distributed
  pairs operator (:func:`dtaidistance_spark.operators.pairs.dtw_pairs`).

Usage::

    from dtaidistance_spark.compat import dtw, dtw_barycenter, ed
    d = dtw.distance(s1, s2, window=10, use_pruning=True)
    D = dtw.distance_matrix(series, compact=False)
    c = dtw_barycenter.dba(series, max_it=10)
"""

from __future__ import annotations

import types

import numpy as np

from dtaidistance_spark import kernels as _K

_INF = float("inf")


# -- dtw ---------------------------------------------------------------------


def _distance(s1, s2, **kwargs):
    """``ref:dtaidistance/dtw.py::distance`` signature subset."""
    kwargs.pop("use_c", None)
    kwargs.pop("only_ub", None)
    return _K.dtw_distance(
        np.asarray(s1, dtype=np.float64), np.asarray(s2, dtype=np.float64),
        **kwargs,
    )


def _distance_matrix(
    s,
    block=None,
    compact=False,
    only_triu=False,
    window=None,
    max_dist=None,
    max_step=None,
    max_length_diff=None,
    penalty=None,
    psi=None,
    use_pruning=False,
    parallel=False,
    use_mp=False,
    use_c=False,
    show_progress=False,
):
    """``ref:dtaidistance/dtw.py::distance_matrix``: upstream-v2
    semantics — only the upper triangle is computed; the default
    ``only_triu=False`` mirrors it to a symmetric matrix with a zero
    diagonal (matching ``distances_array_to_matrix``), ``only_triu=True``
    leaves inf below the diagonal. ``compact=True`` returns ONLY the
    computed condensed entries (row-major), i.e. just the block's pairs
    when ``block=((rb,re),(cb,ce))`` restricts the rectangle. A Spark
    DataFrame input routes to the distributed pairs operator instead
    (returns the condensed pairs DataFrame)."""
    try:  # DataFrame → distributed path, threshold-free (inf)
        from pyspark.sql import DataFrame

        if isinstance(s, DataFrame):
            from dtaidistance_spark.operators.pairs import dtw_pairs

            return dtw_pairs(
                s, threshold=_INF, window=window,
                max_length_diff=max_length_diff, use_lb_keogh=False,
                penalty=penalty, max_step=max_step, psi=psi,
            )
    except ImportError:  # pragma: no cover
        pass

    series = [np.asarray(x, dtype=np.float64) for x in s]
    kw = dict(
        window=window, max_dist=max_dist, max_step=max_step,
        max_length_diff=max_length_diff, penalty=penalty, psi=psi,
        use_pruning=use_pruning,
    )
    return _matrix_from_fn(
        series, lambda a, b: _K.dtw_distance(a, b, **kw),
        block=block, compact=compact, only_triu=only_triu,
    )


def _matrix_from_fn(series, dist_fn, block=None, compact=False, only_triu=False):
    """Shared upper-triangle matrix builder (upstream-v2 semantics) for
    the local ``distance_matrix`` twins: compute only the upper
    triangle (restricted to ``block`` if given), mirror + zero-diagonal
    unless ``only_triu``, or return just the computed condensed entries
    when ``compact``."""
    n = len(series)
    if block is None:
        rb, re_, cb, ce = 0, n, 0, n
    else:
        (rb, re_), (cb, ce) = block
    dense = np.full((n, n), _INF)
    compact_vals = []
    for i in range(rb, re_):
        for j in range(max(cb, i + 1), ce):
            d = dist_fn(series[i], series[j])
            dense[i, j] = d
            compact_vals.append(d)
    if compact:
        return np.asarray(compact_vals, dtype=np.float64)
    if not only_triu:
        iu = np.triu_indices(n, 1)
        dense.T[iu] = dense[iu]
        np.fill_diagonal(dense, 0.0)
    return dense


def _distances_array_to_matrix(dists, nb_series, block=None, only_triu=True):
    """``ref:dtaidistance/dtw.py::distances_array_to_matrix``."""
    m = np.full((nb_series, nb_series), _INF)
    iu = np.triu_indices(nb_series, 1)
    m[iu] = dists
    if not only_triu:
        m.T[iu] = dists
        np.fill_diagonal(m, 0.0)
    return m


dtw = types.SimpleNamespace(
    distance=_distance,
    distance_fast=_distance,  # numpy kernel ≈ the C path's speed class
    distance_matrix=_distance_matrix,
    distance_matrix_fast=_distance_matrix,
    distances_array_to_matrix=_distances_array_to_matrix,
    lb_keogh=lambda s1, s2, window=None, **kw: _K.lb_keogh(
        np.asarray(s1, dtype=np.float64),
        np.asarray(s2, dtype=np.float64),
        window=window,
    ),
    ub_euclidean=lambda s1, s2: _K.ed_distance(
        np.asarray(s1, dtype=np.float64), np.asarray(s2, dtype=np.float64)
    ),
    warping_paths=lambda s1, s2, **kw: _K.warping_paths(
        np.asarray(s1, dtype=np.float64),
        np.asarray(s2, dtype=np.float64),
        **kw,
    ),
    best_path=_K.best_path,
    warping_path=lambda from_s, to_s, **kw: _K.warping_path(
        np.asarray(from_s, dtype=np.float64),
        np.asarray(to_s, dtype=np.float64),
        **kw,
    ),
    warping_amount=_K.warping_amount,
    warping_path_fast=lambda from_s, to_s, **kw: _K.warping_path(
        np.asarray(from_s, dtype=np.float64),
        np.asarray(to_s, dtype=np.float64),
        **kw,
    ),
    warping_paths_fast=lambda s1, s2, **kw: _K.warping_paths(
        np.asarray(s1, dtype=np.float64),
        np.asarray(s2, dtype=np.float64),
        **kw,
    ),
    warp=lambda from_s, to_s, path=None, **kw: _K.warp(
        np.asarray(from_s, dtype=np.float64),
        np.asarray(to_s, dtype=np.float64),
        path=path,
        **kw,
    ),
)


class DTWSettings:
    """``ref:dtaidistance/dtw.py::DTWSettings`` shape: bundles the kernel
    kwargs; ``kwargs()`` returns them for splatting into any dtw call."""

    def __init__(self, window=None, max_dist=None, max_step=None,
                 max_length_diff=None, penalty=None, psi=None,
                 use_pruning=False, inner_dist="squared euclidean"):
        self.window, self.max_dist, self.max_step = window, max_dist, max_step
        self.max_length_diff, self.penalty, self.psi = max_length_diff, penalty, psi
        self.use_pruning, self.inner_dist = use_pruning, inner_dist

    def kwargs(self):
        return dict(
            window=self.window, max_dist=self.max_dist, max_step=self.max_step,
            max_length_diff=self.max_length_diff, penalty=self.penalty,
            psi=self.psi, use_pruning=self.use_pruning,
            inner_dist=self.inner_dist,
        )

    @staticmethod
    def for_dtw(s1, s2, **kwargs):
        return DTWSettings(**kwargs)


dtw.DTWSettings = DTWSettings


# -- ed ----------------------------------------------------------------------

def _ed_distance_matrix(s, block=None, compact=False, only_triu=False,
                        **_ignored):
    """``ref:dtaidistance/ed.py::distance_matrix`` — same upper-triangle
    / block / compact conventions as the dtw matrix."""
    series = [np.asarray(x, dtype=np.float64) for x in s]
    return _matrix_from_fn(
        series, _K.ed_distance,
        block=block, compact=compact, only_triu=only_triu,
    )


ed = types.SimpleNamespace(
    distance=lambda s1, s2: _K.ed_distance(
        np.asarray(s1, dtype=np.float64), np.asarray(s2, dtype=np.float64)
    ),
    distance_fast=lambda s1, s2: _K.ed_distance(
        np.asarray(s1, dtype=np.float64), np.asarray(s2, dtype=np.float64)
    ),
    distance_matrix=_ed_distance_matrix,
    distance_matrix_fast=_ed_distance_matrix,
)


# -- dtw_ndim ----------------------------------------------------------------

def _ndim_distance(s1, s2, use_c=False, **kw):
    return _K.dtw_ndim_distance(
        np.asarray(s1, dtype=np.float64), np.asarray(s2, dtype=np.float64), **kw
    )


def _ndim_distance_matrix(
    s, block=None, compact=False, only_triu=False, window=None,
    max_dist=None, psi=None, parallel=False, use_mp=False, use_c=False,
    show_progress=False,
):
    """``ref:dtaidistance/dtw_ndim.py::distance_matrix`` — same
    block/compact/only_triu semantics as the univariate
    :func:`_distance_matrix`, dependent-warping multivariate kernel.
    Local API-parity twin: the distributed hot paths stay univariate."""
    series = [np.asarray(x, dtype=np.float64) for x in s]
    return _matrix_from_fn(
        series,
        lambda a, b: _K.dtw_ndim_distance(a, b, window=window,
                                          max_dist=max_dist, psi=psi),
        block=block, compact=compact, only_triu=only_triu,
    )


dtw_ndim = types.SimpleNamespace(
    distance=_ndim_distance,
    distance_fast=_ndim_distance,
    distance_matrix=_ndim_distance_matrix,
    distance_matrix_fast=_ndim_distance_matrix,
    warping_paths=lambda s1, s2, **kw: _K.dtw_ndim_warping_paths(
        np.asarray(s1, dtype=np.float64), np.asarray(s2, dtype=np.float64), **kw
    ),
    warping_path=lambda from_s, to_s, **kw: _K.dtw_ndim_warping_path(
        np.asarray(from_s, dtype=np.float64),
        np.asarray(to_s, dtype=np.float64), **kw
    ),
)


# -- dtw_barycenter ----------------------------------------------------------


def _dba(s, c=None, max_it=10, thr=1e-5, mask=None, use_c=False, window=None,
         nb_initial_samples=None, nb_prob_samples=None, **kw):
    """``ref:dtaidistance/dtw_barycenter.py::dba`` / ``dba_loop`` —
    ``mask`` restricts to a boolean-selected subset (the kmeans
    per-cluster call shape); ``nb_initial_samples``/``nb_prob_samples``
    are honored by the kernel (deterministic variants, see
    :func:`dtaidistance_spark.kernels.dba`)."""
    series = [np.asarray(x, dtype=np.float64) for x in s]
    if mask is not None:
        series = [x for x, m in zip(series, mask) if m]
    center = None if c is None else np.asarray(c, dtype=np.float64)
    return _K.dba(
        series, center=center, max_it=max_it, thr=thr, window=window,
        nb_initial_samples=nb_initial_samples,
        nb_prob_samples=nb_prob_samples,
    )


dtw_barycenter = types.SimpleNamespace(dba=_dba, dba_loop=_dba)


# -- preprocessing / similarity / alignment ---------------------------------


def _smoothing(series, smooth=None, window=5):
    """``ref:dtaidistance/preprocessing.py::smoothing`` — upstream
    applies ``filtfilt(butter(2, 2*smooth))``; this is that exact
    recipe, dependency-free (:func:`kernels.smoothing_butterworth`).
    ``smooth=None`` falls back to the SQL-expressible moving average
    (the engine's window-oracle form)."""
    series = np.asarray(series, dtype=np.float64)
    if smooth is None:
        return _K.smoothing(series, window=window)
    return _K.smoothing_butterworth(series, smooth)


def _differencing(series, smooth=None):
    """``ref:dtaidistance/preprocessing.py::differencing`` — np.diff,
    then the upstream Butterworth ``filtfilt`` low-pass when ``smooth``
    is given (short post-diff series fall back to the moving-average
    low-pass rather than failing, since upstream's scipy call would)."""
    d = np.diff(np.asarray(series, dtype=np.float64))
    if smooth is not None:
        if len(d) > 10:
            d = _K.smoothing_butterworth(d, smooth)
        else:
            w = max(3, int(round(1.0 / max(smooth, 1e-6))) | 1)
            d = _K.smoothing(d, window=min(w, max(3, len(d) | 1)))
    return d


preprocessing = types.SimpleNamespace(
    differencing=_differencing,
    smoothing=_smoothing,
)


def _distance_to_similarity(D, r=None, method="exponential"):
    """``ref:dtaidistance/similarity.py::distance_to_similarity``."""
    D = np.asarray(D, dtype=np.float64)
    finite = D[np.isfinite(D)]
    if r is None:
        r = float(finite.max()) if len(finite) else 1.0
    if method in ("exponential", "exp"):
        return np.exp(-D / r)
    if method in ("gaussian", "gauss"):
        return np.exp(-(D**2) / (r**2))
    if method == "reciprocal":
        return 1.0 / (1.0 + D / r)
    if method == "reverse":
        return (r - D) / r
    raise ValueError(f"unknown method: {method}")


def _squash(X, r=None, base=None, x0=None, method="logistic"):
    """``ref:dtaidistance/similarity.py::squash`` — squash values
    toward [0, 1): logistic 1/(1+exp(-(x-x0)/r)) or exponential
    1-exp(-x/r) ([VERIFY] exact upstream defaults once the mount is
    populated; the shape/monotonicity contract is gated)."""
    X = np.asarray(X, dtype=np.float64)
    finite = X[np.isfinite(X)]
    if r is None:
        r = float(finite.std()) or 1.0 if len(finite) else 1.0
    if x0 is None:
        x0 = float(finite.mean()) if len(finite) else 0.0
    if method == "logistic":
        return 1.0 / (1.0 + np.exp(-(X - x0) / r))
    if method in ("exponential", "exp"):
        return 1.0 - np.exp(-X / r)
    raise ValueError(f"unknown method: {method}")


similarity = types.SimpleNamespace(
    distance_to_similarity=_distance_to_similarity,
    squash=_squash,
)

alignment = types.SimpleNamespace(
    needleman_wunsch=lambda s1, s2, **kw: _K.needleman_wunsch(s1, s2, **kw),
    best_alignment=_K.best_alignment,
)


# -- subsequence -------------------------------------------------------------


def subsequence_alignment(query, series, **kw):
    """``ref:dtaidistance/subsequence/dtw.py::subsequence_alignment`` —
    best window of ``series`` matching ``query`` (psi-relaxed on the
    series side). Returns an object with ``.best_match()`` exposing
    ``.value`` and ``.segment`` like upstream's ``SAMatch``."""
    from dtaidistance_spark.operators.pairs import subsequence_best_match

    start, end, value = subsequence_best_match(
        np.asarray(query, dtype=np.float64),
        np.asarray(series, dtype=np.float64),
        **kw,
    )

    match = types.SimpleNamespace(value=value, segment=(start, end))
    return types.SimpleNamespace(best_match=lambda: match)


subsequence = types.SimpleNamespace(subsequence_alignment=subsequence_alignment)


# -- dtw_weighted (C5: kernel + decision-tree weight learning) ---------------


def _weighted_distance(s1, s2, weights=None, window=None, max_dist=None, **_ignored):
    """``ref:dtaidistance/dtw_weighted.py::distance`` signature subset."""
    return _K.dtw_weighted_distance(
        np.asarray(s1, dtype=np.float64),
        np.asarray(s2, dtype=np.float64),
        weights=weights, window=window, max_dist=max_dist,
    )


def _compute_weights_using_dt(series, labels, prototypeidx, **kwargs):
    """``ref:dtaidistance/dtw_weighted.py::compute_weights_using_dt``
    surface — see :mod:`dtaidistance_spark.weightlearn`."""
    from dtaidistance_spark import weightlearn as _WL

    return _WL.compute_weights_using_dt(series, labels, prototypeidx, **kwargs)


def _series_to_dt(series, prototypeidx, window=None):
    """``ref:dtaidistance/dtw_weighted.py::series_to_dt``-shaped
    featurization (the (N, 2n) per-side deviation matrix)."""
    from dtaidistance_spark import weightlearn as _WL

    return _WL.series_to_features(series, prototypeidx, window=window)


def _wl_tree(*args, **kwargs):
    from dtaidistance_spark import weightlearn as _WL

    return _WL.DecisionTreeClassifier(*args, **kwargs)


dtw_weighted = types.SimpleNamespace(
    distance=_weighted_distance,
    compute_weights_using_dt=_compute_weights_using_dt,
    series_to_dt=_series_to_dt,
    DecisionTreeClassifier=_wl_tree,
)


# -- clustering --------------------------------------------------------------


def _pairwise_rows(series, **dists_options):
    """Condensed pair list [(i, j, d)] via the batched kernel."""
    arrs = [np.asarray(x, dtype=np.float64) for x in series]
    n = len(arrs)
    rows = []
    window = dists_options.get("window")
    for i in range(n):
        rest = arrs[i + 1:]
        if not rest:
            continue
        L = max(len(x) for x in rest)
        M = np.zeros((len(rest), L))
        lens = np.empty(len(rest), dtype=np.int64)
        for m, x in enumerate(rest):
            M[m, : len(x)] = x
            lens[m] = len(x)
        d = _K.dtw_distance_batch(arrs[i], M, lens, window=window)
        rows.extend(
            {"id_a": str(i), "id_b": str(i + 1 + m), "dist": float(v)}
            for m, v in enumerate(d)
        )
    return rows


class KMeans:
    """``ref:dtaidistance/clustering/kmeans.py::KMeans`` shape:
    ``KMeans(k, max_it=..).fit(series)`` -> (cluster_idx_map, performed_it)
    with ``cluster_idx_map = {cluster: set(member_idx)}``. Runs the
    engine's deterministic local twin of the distributed driver
    (:func:`dtaidistance_spark.clustering.kmeans.dtw_kmeans_local`)."""

    def __init__(self, k, max_it=10, max_dba_it=2, window=8, length=64,
                 initialize_with_kmeanspp=False, drop_stddev=None, **_ignored):
        self.k, self.max_it = k, max_it
        self.max_dba_it, self.window, self.length = max_dba_it, window, length
        self.init = "kmeans++" if initialize_with_kmeanspp else "hash"
        self.drop_stddev = drop_stddev

    def fit(self, series):
        import pandas as pd

        from dtaidistance_spark.clustering.kmeans import dtw_kmeans_local

        pdf = pd.DataFrame(
            {
                "doc_id": [f"i{i:06d}" for i in range(len(series))],
                "tokens": [list(map(float, s)) for s in series],
            }
        )
        out, self.centers, performed_it = dtw_kmeans_local(
            pdf, k=self.k, max_it=self.max_it, length=self.length,
            window=self.window, dba_max_it=self.max_dba_it, init=self.init,
            drop_stddev=self.drop_stddev,
            hash_fn=lambda s: int.from_bytes(__import__("hashlib").md5(s.encode()).digest()[:8], "big"),
        )
        clusters: dict[int, set] = {}
        for idx, c in enumerate(out["cluster"]):
            clusters.setdefault(int(c), set()).add(idx)
        return clusters, performed_it


class Hierarchical:
    """``ref:dtaidistance/clustering/hierarchical.py::Hierarchical``
    shape: ``Hierarchical(dists_fun, dists_options, max_dist).fit(series)``
    -> {root_idx: set(member_idx)}. ``dists_fun`` is accepted for
    signature parity; distances come from the engine's banded kernel
    with ``dists_options`` (e.g. ``{'window': 8}``)."""

    def __init__(self, dists_fun=None, dists_options=None, max_dist=float("inf"),
                 merge_hook=None, **_ignored):
        self.dists_options = dists_options or {}
        self.max_dist = max_dist
        self.merge_hook = merge_hook

    def fit(self, series, _rows=None):
        from dtaidistance_spark.clustering.hierarchical import single_linkage

        rows = _pairwise_rows(series, **self.dists_options) if _rows is None else _rows
        hook = None
        if self.merge_hook is not None:
            hook = lambda hi, lo, d: self.merge_hook(int(hi), int(lo), d)
        roots = single_linkage(rows, self.max_dist, on_merge=hook)
        clusters: dict[int, set] = {}
        for i in range(len(series)):
            root = int(roots.get(str(i), str(i)))
            clusters.setdefault(root, set()).add(i)
        return clusters


class HierarchicalTree:
    """``ref:dtaidistance/clustering/hierarchical.py::HierarchicalTree``
    shape: wraps a ``Hierarchical`` model, forces a full merge to one
    root (upstream overrides max_dist to inf), and records the
    dendrogram on ``self.linkage`` — here as the scipy Z-format matrix
    from :func:`~dtaidistance_spark.clustering.hierarchical.linkage_matrix`
    ([VERIFY] upstream keeps per-merge tuples collected via hooks; the
    Z rows carry the same merges in the same ascending order)."""

    def __init__(self, model=None, **kwargs):
        kwargs.pop("max_dist", None)
        self._model = model if model is not None else Hierarchical(**kwargs)
        self._model.max_dist = float("inf")
        self.linkage = None

    def fit(self, series):
        from dtaidistance_spark.clustering.hierarchical import linkage_matrix

        rows = _pairwise_rows(series, **self._model.dists_options)
        self.linkage = linkage_matrix(rows, len(series))
        return self._model.fit(series, _rows=rows)


class LinkageTree:
    """``ref:dtaidistance/clustering/hierarchical.py::LinkageTree``:
    ``fit(series)`` computes ``self.linkage`` in scipy Z-format; the
    dendrogram renders via ``plot`` (dependency-free SVG), ``to_newick``
    and ``to_ascii`` — matplotlib is absent from this container, so the
    SVG writer replaces upstream's canvas. Only single linkage is
    offered — the method whose merges are exactly derivable from the
    engine's distributed (LB-pruned) pair set."""

    def __init__(self, dists_fun=None, dists_options=None, method="single",
                 **_ignored):
        if method != "single":
            raise NotImplementedError(
                "LinkageTree supports method='single' (the distributed-"
                "pairs-derivable linkage); scipy offers the rest locally"
            )
        self.dists_options = dists_options or {}
        self.linkage = None

    def fit(self, series):
        from dtaidistance_spark.clustering.hierarchical import linkage_matrix

        rows = _pairwise_rows(series, **self.dists_options)
        self.linkage = linkage_matrix(rows, len(series))
        return self.linkage

    def to_newick(self, labels=None) -> str:
        """Newick serialization of the fitted dendrogram — the
        no-dependency stand-in for upstream's ``plot`` (every standard
        tree viewer reads Newick)."""
        from dtaidistance_spark.clustering.hierarchical import newick

        if self.linkage is None:
            raise ValueError("call fit() first")
        return newick(self.linkage, labels)

    def to_ascii(self, labels=None) -> str:
        """Plain-text dendrogram of the fitted linkage."""
        from dtaidistance_spark.clustering.hierarchical import (
            ascii_dendrogram,
        )

        if self.linkage is None:
            raise ValueError("call fit() first")
        return ascii_dendrogram(self.linkage, labels)

    def plot(self, filename=None, labels=None, **_ignored) -> str:
        """``LinkageTree.plot`` — SVG dendrogram (returns the SVG
        string; writes it when ``filename`` is given)."""
        from dtaidistance_spark.visualisation import plot_linkage

        if self.linkage is None:
            raise ValueError("call fit() first")
        return plot_linkage(self.linkage, labels=labels, filename=filename)


class KMedoids:
    """``ref:dtaidistance/clustering/kmedoids.py::KMedoids`` shape:
    ``KMedoids(dists_fun, dists_options, k).fit(series)`` ->
    {medoid_idx: set(member_idx)} (full PAM iterate)."""

    def __init__(self, dists_fun=None, dists_options=None, k=3, **_ignored):
        self.dists_options = dists_options or {}
        self.k = k

    def fit(self, series):
        from dtaidistance_spark.clustering.hierarchical import kmedoids

        rows = _pairwise_rows(series, **self.dists_options)
        assign, _cost = kmedoids(rows, [str(i) for i in range(len(series))], k=self.k)
        clusters: dict[int, set] = {}
        for i_str, med in assign.items():
            clusters.setdefault(int(med), set()).add(int(i_str))
        return clusters


clustering = types.SimpleNamespace(
    kmeans=types.SimpleNamespace(KMeans=KMeans),
    hierarchical=types.SimpleNamespace(
        Hierarchical=Hierarchical,
        HierarchicalTree=HierarchicalTree,
        LinkageTree=LinkageTree,
    ),
    kmedoids=types.SimpleNamespace(KMedoids=KMedoids),
)


def subsequence_search(query, s, dists_options=None, **kw):
    """``ref:dtaidistance/subsequence/dtw.py::subsequence_search`` —
    rank candidate series by their best-matching window for ``query``.
    Returns an object with ``.kbest_matches(k)`` yielding matches with
    ``.value`` / ``.idx`` / ``.segment`` (upstream ``SSMatch`` shape).
    A Spark DataFrame for ``s`` routes to the distributed operator."""
    from dtaidistance_spark.operators.pairs import (
        subsequence_best_match,
        subsequence_search as dist_search,
    )

    window = (dists_options or {}).get("window", kw.get("window"))

    try:
        from pyspark.sql import DataFrame

        if isinstance(s, DataFrame):
            def kbest_df(k):
                return dist_search(s, np.asarray(query, dtype=np.float64),
                                   k=k, window=window)

            return types.SimpleNamespace(kbest_matches=kbest_df)
    except ImportError:  # pragma: no cover
        pass

    q = np.asarray(query, dtype=np.float64)
    matches = []
    for idx, series in enumerate(s):
        st, en, val = subsequence_best_match(
            q, np.asarray(series, dtype=np.float64), window=window
        )
        matches.append(
            types.SimpleNamespace(idx=idx, value=val, segment=(st, en))
        )
    matches.sort(key=lambda m: (m.value, m.idx))

    return types.SimpleNamespace(kbest_matches=lambda k: matches[:k])


subsequence.subsequence_search = subsequence_search


# -- dtw_visualisation (SVG; matplotlib absent from the container) -----------


def _plot_warping(s1, s2, path=None, filename=None, **kw):
    """``ref:dtaidistance/dtw_visualisation.py::plot_warping`` surface
    — returns/writes a standalone SVG instead of a matplotlib figure."""
    from dtaidistance_spark.visualisation import plot_warping as _pw

    return _pw(s1, s2, path=path, filename=filename, **kw)


def _plot_warpingpaths(s1, s2, paths=None, path=None, filename=None, **kw):
    """``ref:dtaidistance/dtw_visualisation.py::plot_warpingpaths``."""
    from dtaidistance_spark.visualisation import plot_warpingpaths as _pwp

    return _pwp(s1, s2, paths=paths, path=path, filename=filename, **kw)


dtw_visualisation = types.SimpleNamespace(
    plot_warping=_plot_warping,
    plot_warpingpaths=_plot_warpingpaths,
)
