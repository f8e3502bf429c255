"""The classic elastic-distance family beyond DTW (K12, round 3):
LCSS, EDR, ERP, MSM, TWE and soft-DTW as pair-batched numpy DPs.

dtaidistance is a time-series *distance* library; alongside DTW the
literature's standard elastic measures (the UCR-suite / Bagnall
bake-off set) are:

* **LCSS** (Vlachos-Kollios-Gunopulos ICDE'02) — longest common
  subsequence with value tolerance ``epsilon`` and band ``window``;
  a SIMILARITY (higher = closer), robust to outliers because
  unmatched elements cost nothing.
* **EDR** (Chen-Özsu-Oria SIGMOD'05) — edit distance on real
  sequences: substitution free iff ``|a−b| ≤ epsilon`` else 1,
  indels 1.  At ``epsilon = 0`` on integers it IS classic
  Levenshtein — the oracle hook ``operators/elastic_q.py`` uses.
* **ERP** (Chen-Ng VLDB'04) — edit distance with real penalty: gaps
  cost ``|value − g|`` against a fixed gap value ``g``; the only
  L1-family elastic measure that is a METRIC.
* **MSM** (Stefan-Athitsos-Das TKDE'13) — move-split-merge: moves
  cost ``|a−b|``, splits/merges a constant ``c``; also a metric.
* **TWE** (Marteau TPAMI'09) — time-warp edit with stiffness ``nu``
  (cost per unit of index warp) and gap penalty ``lam``; metric for
  ``nu > 0``.
* **soft-DTW** (Cuturi-Blondel ICML'17) — DTW with min replaced by
  soft-min ``−γ·log Σ exp(−x/γ)`` over squared-difference costs;
  differentiable, can go negative for large ``γ``.

Every kernel is **batched across pairs**: inputs are ``(P, r)`` /
``(P, c)`` float64 stacks and the (i, j) recursion runs as length-P
vector ops — one Python-level loop nest over the ≤128² DP grid, zero
per-pair Python.  All support a Sakoe-Chiba ``window`` (cells with
``|i − j| > window`` are invalid): at ``window = 0`` each DP collapses
to its diagonal and the value has a closed integer-exact form
(LCSS = aligned-match count, ERP/MSM = L1, TWE = 2·L1 − |a_n − b_n|,
soft-DTW = squared Euclidean) — the band-degeneration trick of
``operators/diag_q.py`` extended to the whole family, giving every
kernel a full-value DuckDB oracle while the general DP (driven
unchanged, only the parameter degenerates) is gated in pytest against
brute-force per-pair reference DPs.

Scale shape: kernels are embarrassingly parallel over pairs;
:func:`elastic_score` maps them over a candidate-pair DataFrame
(candidates from the LSH/bucket stack at corpus scale — same scorer
posture as T65), :func:`elastic_all_pairs` is the small-corpus
convenience with an explicit size guard.

ref: dtaidistance/dtw.py (DTW家族 surface); the five measures above
are public-literature companions the upstream ecosystem (sktime,
aeon, tslearn) ships alongside dtaidistance's DTW.
"""

from __future__ import annotations

import numpy as np

INF = float("inf")


def _valid(i: int, j: int, window) -> bool:
    return window is None or abs(i - j) <= int(window)


# ---------------------------------------------------------------- LCSS


def lcss_batch(A, B, epsilon=0.0, window=None):
    """LCSS length per pair: (P,) int64. Match iff |a_i − b_j| ≤
    epsilon AND |i − j| ≤ window (Vlachos's banded definition); skips
    are free and unrestricted."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    P, r = A.shape
    c = B.shape[1]
    prev = np.zeros((P, c + 1), dtype=np.int64)
    cur = np.zeros((P, c + 1), dtype=np.int64)
    for i in range(1, r + 1):
        cur[:, 0] = 0
        ai = A[:, i - 1]
        for j in range(1, c + 1):
            best = np.maximum(prev[:, j], cur[:, j - 1])
            if _valid(i, j, window):
                m = np.abs(ai - B[:, j - 1]) <= epsilon
                cur[:, j] = np.where(m, prev[:, j - 1] + 1, best)
            else:
                cur[:, j] = best
        prev, cur = cur, prev
    return prev[:, c].copy()


# ----------------------------------------------------------------- EDR


def edr_batch(A, B, epsilon=0.0, window=None):
    """EDR per pair: (P,) float64 (integer-valued). subst cost 0 iff
    |a − b| ≤ epsilon else 1; indels 1; out-of-band cells INF (borders
    are in-band up to the window)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    P, r = A.shape
    c = B.shape[1]
    prev = np.empty((P, c + 1))
    cur = np.empty((P, c + 1))
    for j in range(c + 1):
        prev[:, j] = j if _valid(0, j, window) else INF
    for i in range(1, r + 1):
        cur[:, 0] = i if _valid(i, 0, window) else INF
        ai = A[:, i - 1]
        for j in range(1, c + 1):
            if not _valid(i, j, window):
                cur[:, j] = INF
                continue
            sub = prev[:, j - 1] + (np.abs(ai - B[:, j - 1]) > epsilon)
            cur[:, j] = np.minimum(
                sub, np.minimum(prev[:, j] + 1.0, cur[:, j - 1] + 1.0)
            )
        prev, cur = cur, prev
    return prev[:, c].copy()


# ----------------------------------------------------------------- ERP


def erp_batch(A, B, g=0.0, window=None):
    """ERP per pair: (P,) float64. Gaps cost |value − g|; border row /
    column are the cumulative gap chains (in-band prefix)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    P, r = A.shape
    c = B.shape[1]
    gb = np.abs(B - g)  # (P, c)
    ga = np.abs(A - g)  # (P, r)
    prev = np.empty((P, c + 1))
    cur = np.empty((P, c + 1))
    prev[:, 0] = 0.0
    for j in range(1, c + 1):
        prev[:, j] = (
            prev[:, j - 1] + gb[:, j - 1] if _valid(0, j, window) else INF
        )
    acc_a = np.zeros(P)
    for i in range(1, r + 1):
        acc_a = acc_a + ga[:, i - 1]
        cur[:, 0] = acc_a if _valid(i, 0, window) else INF
        ai = A[:, i - 1]
        for j in range(1, c + 1):
            if not _valid(i, j, window):
                cur[:, j] = INF
                continue
            cur[:, j] = np.minimum(
                prev[:, j - 1] + np.abs(ai - B[:, j - 1]),
                np.minimum(
                    prev[:, j] + ga[:, i - 1], cur[:, j - 1] + gb[:, j - 1]
                ),
            )
        prev, cur = cur, prev
    return prev[:, c].copy()


# ----------------------------------------------------------------- MSM


def _msm_c(x, y, z, c):
    """Split/merge cost C(x | y, z): c if x lies between y and z, else
    c + distance to the nearer of the two (Stefan et al. eq. 2)."""
    between = ((y <= x) & (x <= z)) | ((z <= x) & (x <= y))
    return np.where(
        between, c, c + np.minimum(np.abs(x - y), np.abs(x - z))
    )


def msm_batch(A, B, c=1.0, window=None):
    """MSM per pair: (P,) float64. Moves |a − b|, splits/merges via
    :func:`_msm_c`; first row/column are the standard chained bases."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    P, r = A.shape
    cc = B.shape[1]
    prev = np.empty((P, cc + 1))
    cur = np.empty((P, cc + 1))
    prev[:] = INF
    for i in range(1, r + 1):
        cur[:] = INF
        ai = A[:, i - 1]
        for j in range(1, cc + 1):
            if not _valid(i, j, window):
                continue
            bj = B[:, j - 1]
            if i == 1 and j == 1:
                cur[:, 1] = np.abs(ai - bj)
                continue
            if i == 1:
                move = np.full(P, INF)
            else:
                move = prev[:, j - 1] + np.abs(ai - bj)
                if j == 1 and i > 1:
                    # (i, 1) base: chain of merges down the first column
                    cur[:, 1] = prev[:, 1] + _msm_c(ai, A[:, i - 2], bj, c)
                    continue
            merge = (
                prev[:, j] + _msm_c(ai, A[:, i - 2], bj, c)
                if i > 1
                else np.full(P, INF)
            )
            split = (
                cur[:, j - 1] + _msm_c(bj, ai, B[:, j - 2], c)
                if j > 1
                else np.full(P, INF)
            )
            cur[:, j] = np.minimum(move, np.minimum(merge, split))
        prev, cur = cur, prev
    return prev[:, cc].copy()


# ----------------------------------------------------------------- TWE


def twe_batch(A, B, nu=1.0, lam=1.0, window=None):
    """TWE per pair: (P,) float64, Marteau's recursion with the
    conventional 0-padding (a_0 = b_0 = 0):

      match = D[i−1][j−1] + |a_i−b_j| + |a_{i−1}−b_{j−1}| + 2ν|i−j|
      delA  = D[i−1][j] + |a_i − a_{i−1}| + ν + λ
      delB  = D[i][j−1] + |b_j − b_{j−1}| + ν + λ

    border row/column are the cumulative delete chains (in-band)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    P, r = A.shape
    c = B.shape[1]
    A0 = np.concatenate([np.zeros((P, 1)), A], axis=1)  # (P, r+1)
    B0 = np.concatenate([np.zeros((P, 1)), B], axis=1)
    da = np.abs(np.diff(A0, axis=1))  # |a_i − a_{i−1}|, (P, r)
    db = np.abs(np.diff(B0, axis=1))  # (P, c)
    prev = np.empty((P, c + 1))
    cur = np.empty((P, c + 1))
    prev[:, 0] = 0.0
    for j in range(1, c + 1):
        prev[:, j] = (
            prev[:, j - 1] + db[:, j - 1] + nu + lam
            if _valid(0, j, window)
            else INF
        )
    acc = np.zeros(P)
    for i in range(1, r + 1):
        acc = acc + da[:, i - 1] + nu + lam
        cur[:, 0] = acc if _valid(i, 0, window) else INF
        for j in range(1, c + 1):
            if not _valid(i, j, window):
                cur[:, j] = INF
                continue
            match = (
                prev[:, j - 1]
                + np.abs(A0[:, i] - B0[:, j])
                + np.abs(A0[:, i - 1] - B0[:, j - 1])
                + 2.0 * nu * abs(i - j)
            )
            del_a = prev[:, j] + da[:, i - 1] + nu + lam
            del_b = cur[:, j - 1] + db[:, j - 1] + nu + lam
            cur[:, j] = np.minimum(match, np.minimum(del_a, del_b))
        prev, cur = cur, prev
    return prev[:, c].copy()


# ------------------------------------------------------------ soft-DTW


def _softmin3(x, y, z, gamma):
    """Stable soft-min over three (P,) arrays, exact at single-finite
    inputs (exp(−INF) underflows to 0 so the log term is log 1 = 0)."""
    m = np.minimum(x, np.minimum(y, z))
    out = np.full_like(m, INF)
    fin = np.isfinite(m)
    if fin.any():
        with np.errstate(invalid="ignore"):
            s = (
                np.exp(-(x[fin] - m[fin]) / gamma)
                + np.exp(-(y[fin] - m[fin]) / gamma)
                + np.exp(-(z[fin] - m[fin]) / gamma)
            )
        out[fin] = m[fin] - gamma * np.log(s)
    return out


def soft_dtw_batch(A, B, gamma=1.0, window=None):
    """soft-DTW per pair: (P,) float64 over squared-difference costs
    (the canonical Cuturi-Blondel setup). γ → 0 recovers DTW² (hard
    min); at window = 0 the single-path soft-min is EXACT (bit-equal
    to Σ(a−b)²)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    P, r = A.shape
    c = B.shape[1]
    prev = np.full((P, c + 1), INF)
    cur = np.empty((P, c + 1))
    prev[:, 0] = 0.0
    for i in range(1, r + 1):
        cur[:] = INF
        ai = A[:, i - 1]
        for j in range(1, c + 1):
            if not _valid(i, j, window):
                continue
            d = ai - B[:, j - 1]
            cur[:, j] = d * d + _softmin3(
                prev[:, j - 1], prev[:, j], cur[:, j - 1], gamma
            )
        prev, cur = cur, prev
    return prev[:, c].copy()


_KERNELS = {
    "lcss": lcss_batch,
    "edr": edr_batch,
    "erp": erp_batch,
    "msm": msm_batch,
    "twe": twe_batch,
    "soft_dtw": soft_dtw_batch,
}

_MAX_ALL_PAIRS = 2048  # docs; all-pairs beyond this must come via LSH


def elastic_score(pairs_df, metric: str, out_col: str = "value", **params):
    """Score a candidate-pair DataFrame (id_a, id_b, ta, tb — equal
    lengths within a batch enforced by stacking) with one elastic
    kernel, Arrow-batched: the production scorer tier (candidates from
    the LSH/bucket stack at corpus scale, exactly T65's posture)."""
    import pandas as pd

    kern = _KERNELS[metric]

    def run(batches):
        for b in batches:
            if len(b) == 0:
                continue
            A = np.stack([np.asarray(t, dtype=np.float64) for t in b["ta"]])
            Bm = np.stack([np.asarray(t, dtype=np.float64) for t in b["tb"]])
            yield pd.DataFrame(
                {
                    "id_a": b["id_a"],
                    "id_b": b["id_b"],
                    out_col: kern(A, Bm, **params).astype(np.float64),
                }
            )

    return pairs_df.mapInPandas(
        run, f"id_a string, id_b string, {out_col} double"
    )


def elastic_all_pairs(df, metric: str, out_col: str = "value", **params):
    """All unordered pairs of ``df`` (doc_id, tokens) scored with
    ``metric``. Size-guarded: raises past ``_MAX_ALL_PAIRS`` docs —
    at corpus scale candidates must come from the LSH stack instead
    (the ADVICE.md all-pairs guard, applied here from day one)."""
    from pyspark.sql import functions as F

    n = df.limit(_MAX_ALL_PAIRS + 1).count()
    if n > _MAX_ALL_PAIRS:
        raise ValueError(
            f"elastic_all_pairs: {n}+ docs exceeds the all-pairs guard "
            f"({_MAX_ALL_PAIRS}); build candidate pairs via LSH and use "
            "elastic_score instead"
        )
    a = df.select(F.col("doc_id").alias("id_a"), F.col("tokens").alias("ta"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("tokens").alias("tb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).repartition(
        32, "id_a"
    )
    return elastic_score(pairs, metric, out_col=out_col, **params)
