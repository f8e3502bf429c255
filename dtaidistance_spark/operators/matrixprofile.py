"""Distributed matrix profile (self-join) over the token table.

The matrix profile (Yeh et al., "Matrix Profile I", ICDM 2016) is the
classic motif/discord discovery primitive for time series: for every
length-``m`` subsequence of a series, the distance to its nearest
non-trivial neighbor within the same series. The minimum of the profile
marks the best motif pair; the maximum marks the top discord (anomaly).
It complements the DTW machinery (``kernels.py``) the same way
``local_concurrences`` does upstream (``ref:dtaidistance/subsequence/
dtw.py::local_concurrences`` — self-similarity discovery), but with the
subsequence-join semantics the matrix-profile literature standardized.

Distance choice: **squared Euclidean over the raw integer tokens** (no
z-normalization). Two reasons, both deliberate:

* tokens are a discrete vocabulary, not an amplitude signal — offset/
  scale invariance (the reason MASS z-normalizes) does not apply;
* every pairwise distance is then an exact integer (products
  < 5e4^2, window sums < 8 * 2.5e9 < 2^53), so float64 BLAS matmuls
  compute it bit-exactly and DuckDB can re-derive the full profile
  independently with list lambdas — a full-value driver oracle for an
  operator family that is normally "rows-only" (see ``motif_q``).

Scale shape: one series = one unit of work, embarrassingly parallel
across the corpus — ``mapInPandas`` with zero shuffles (the profile of
a series depends on nothing else). Within a series the O(q^2) distance
matrix is evaluated in **row blocks** (``block`` rows at a time) with a
running per-row minimum, so peak memory is O(block * q) not O(q^2):
an 8192-token series needs ~33 MB per block at block=512, never the
536 MB a full q x q materialization would take. Each block is one BLAS
sgemm-shaped matmul (W[block] @ W.T) — the dominant cost stays in
vectorized C for any series length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "doc_id string, pos int, nn_pos int, d2 long"


def mp_self(a: np.ndarray, m: int, excl: int, block: int = 512):
    """Exact squared-Euclidean self-join matrix profile of one series.

    Returns ``(d2, nn)`` int64 arrays of length ``q = n - m + 1``:
    ``d2[i]`` = min over j with \\|i-j\\| > excl of
    sum_k (a[i+k]-a[j+k])^2, ``nn[i]`` = the smallest such argmin j
    (numpy ``argmin`` first-occurrence == the oracle's ORDER BY d2, j).
    Returns None when no position has any admissible neighbor
    (q <= excl + 1); an individual position with no admissible
    neighbor (possible while q < 2*excl + 2) gets the sentinel
    ``d2 = nn = -1``.
    """
    a = np.asarray(a, dtype=np.int64)
    n = a.size
    q = n - m + 1
    if q <= excl + 1:
        return None
    # exact in float64: every dot product and window power sum < 2^53
    W = np.lib.stride_tricks.sliding_window_view(a, m).astype(np.float64)
    S = np.einsum("ij,ij->i", W, W)
    best_d = np.empty(q, dtype=np.float64)
    best_j = np.empty(q, dtype=np.int64)
    cols = np.arange(q)
    for r0 in range(0, q, block):
        r1 = min(r0 + block, q)
        G = W[r0:r1] @ W.T
        D = S[r0:r1, None] + S[None, :] - 2.0 * G
        off = cols[None, :] - np.arange(r0, r1)[:, None]
        D[np.abs(off) <= excl] = np.inf
        j = np.argmin(D, axis=1)
        best_d[r0:r1] = D[np.arange(r1 - r0), j]
        best_j[r0:r1] = j
    dead = ~np.isfinite(best_d)
    best_d[dead] = -1.0
    best_j[dead] = -1
    return best_d.astype(np.int64), best_j


def matrix_profile(
    df: DataFrame,
    m: int = 8,
    excl: int | None = None,
    max_len: int | None = None,
    block: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-series matrix profile as a DataFrame operator.

    ``df`` rows carry ``(id_col string, tokens_col array<int>)``; output
    one row per subsequence position: ``(doc_id, pos, nn_pos, d2)``.
    ``excl`` defaults to ``m // 2`` (the standard trivial-match
    exclusion zone). Series shorter than ``m + excl + 1`` emit nothing.
    Zero shuffles: a pure ``mapInPandas`` projection.
    """
    exc = m // 2 if excl is None else excl

    def gen(batches):
        for pdf in batches:
            ids: list[str] = []
            pos: list[np.ndarray] = []
            nn: list[np.ndarray] = []
            d2: list[np.ndarray] = []
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                a = np.asarray(toks, dtype=np.int64)
                if max_len is not None:
                    a = a[:max_len]
                res = mp_self(a, m, exc, block)
                if res is None:
                    continue
                dv, jv = res
                ids.extend([doc_id] * dv.size)
                pos.append(np.arange(dv.size, dtype=np.int32))
                nn.append(jv.astype(np.int32))
                d2.append(dv)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "pos": np.concatenate(pos),
                    "nn_pos": np.concatenate(nn),
                    "d2": np.concatenate(d2),
                }
            )

    return df.select(id_col, tokens_col).mapInPandas(gen, OUT_SCHEMA)


AB_SCHEMA = "doc_id string, pos int, q_doc string, q_pos int, d2 long"


def matrix_profile_ab(
    corpus_df: DataFrame,
    query_df: DataFrame,
    m: int = 8,
    max_len: int | None = None,
    block: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """AB-join matrix profile: for every length-``m`` window of every
    corpus series, the nearest window across ALL query series (exact
    squared Euclidean; no exclusion zone — the sides are distinct).

    This is the windowed-overlap screen a training pipeline runs
    against a benchmark set: a ``d2 = 0`` hit is a verbatim m-token
    overlap (contamination); small ``d2`` is a near-verbatim variant.

    Scale shape: the QUERY side is the small one by contract (a
    benchmark suite, not a corpus) — its stacked window matrix is
    collected once driver-side and broadcast into the corpus-side
    ``mapInPandas`` closure, the same broadcast-small-side pattern as
    ``ann.brute_cosine_topk``. The corpus side streams through in Arrow
    batches with zero shuffles; per corpus series the cost is one
    blocked BLAS matmul against the query windows. Ties break to the
    first stacked query window == ORDER BY (d2, q_doc, q_pos).
    """
    q_rows = sorted(
        ((r[id_col], list(r[tokens_col])) for r in query_df.select(
            id_col, tokens_col).collect()),
        key=lambda t: t[0],
    )
    q_ids: list[str] = []
    q_pos: list[int] = []
    wq_parts = []
    for qd, toks in q_rows:
        a = np.asarray(toks, dtype=np.int64)
        if max_len is not None:
            a = a[:max_len]
        if a.size < m:
            continue
        w = np.lib.stride_tricks.sliding_window_view(a, m)
        wq_parts.append(w)
        q_ids.extend([qd] * w.shape[0])
        q_pos.extend(range(w.shape[0]))
    if not wq_parts:
        raise ValueError("query side has no window of length m")
    Wq = np.concatenate(wq_parts).astype(np.float64)
    Sq = np.einsum("ij,ij->i", Wq, Wq)
    q_ids_arr = np.asarray(q_ids)
    q_pos_arr = np.asarray(q_pos, dtype=np.int32)

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                a = np.asarray(toks, dtype=np.int64)
                if max_len is not None:
                    a = a[:max_len]
                if a.size < m:
                    continue
                W = np.lib.stride_tricks.sliding_window_view(a, m).astype(
                    np.float64
                )
                S = np.einsum("ij,ij->i", W, W)
                q = W.shape[0]
                best_d = np.empty(q)
                best_j = np.empty(q, dtype=np.int64)
                for r0 in range(0, q, block):
                    r1 = min(r0 + block, q)
                    D = (
                        S[r0:r1, None]
                        + Sq[None, :]
                        - 2.0 * (W[r0:r1] @ Wq.T)
                    )
                    j = np.argmin(D, axis=1)
                    best_d[r0:r1] = D[np.arange(r1 - r0), j]
                    best_j[r0:r1] = j
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": [doc_id] * q,
                            "pos": np.arange(q, dtype=np.int32),
                            "q_doc": q_ids_arr[best_j],
                            "q_pos": q_pos_arr[best_j],
                            "d2": best_d.astype(np.int64),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return corpus_df.select(id_col, tokens_col).mapInPandas(gen, AB_SCHEMA)


def mp_self_znorm(a: np.ndarray, m: int, excl: int, block: int = 512):
    """Z-NORMALIZED self-join matrix profile (the standard MASS/SCAMP
    semantics): d2[i] = min over admissible j of
    ``2*m*(1 - corr(i, j))`` where corr is the Pearson correlation of
    the two windows — equal to the squared Euclidean distance between
    the z-normalized windows.

    Exactness-by-construction (what makes this SQL-oracle-able even
    though the values are real): every input to the floating pipeline
    is an EXACT integer in float64 (window sums, power sums,
    m*dot - Sx*Sy numerators and m*Sxx - Sx^2 variances are all
    < 2^53), and the pipeline is exactly one sqrt per window, one
    product, one division, one clip, and one affine map — each IEEE-754
    correctly rounded (note sqrt(v)^2 may land an ulp either side of v,
    so even a verbatim match can sit a few ulps above 0 — both engines
    agree on the residual, which is what the oracle hash proves), so numpy and DuckDB produce bit-identical
    doubles when the SQL spells the SAME expression tree
    (``2*m*(1 - greatest(-1, least(1, num/(sqrt(va)*sqrt(vb)))))``).

    Degenerate windows: both constant -> d2 = 0 (their z-norms are the
    same zero vector by convention); exactly one constant -> corr = 0,
    d2 = 2*m. Same sentinel contract as :func:`mp_self` for positions
    with no admissible neighbor (d2 = nn = -1).
    """
    a = np.asarray(a, dtype=np.int64)
    n = a.size
    q = n - m + 1
    if q <= excl + 1:
        return None
    W = np.lib.stride_tricks.sliding_window_view(a, m).astype(np.float64)
    Sx = W.sum(axis=1)
    Sxx = np.einsum("ij,ij->i", W, W)
    var = m * Sxx - Sx * Sx  # exact integers in float64
    s = np.sqrt(var)
    best_d = np.empty(q, dtype=np.float64)
    best_j = np.empty(q, dtype=np.int64)
    cols = np.arange(q)
    fm = float(m)
    for r0 in range(0, q, block):
        r1 = min(r0 + block, q)
        G = W[r0:r1] @ W.T
        num = fm * G - Sx[r0:r1, None] * Sx[None, :]
        den = s[r0:r1, None] * s[None, :]
        va = var[r0:r1, None]
        vb = var[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.clip(num / den, -1.0, 1.0)
        corr = np.where(
            (va > 0) & (vb > 0),
            corr,
            np.where((va == 0) & (vb == 0), 1.0, 0.0),
        )
        D = 2.0 * fm * (1.0 - corr)
        off = cols[None, :] - np.arange(r0, r1)[:, None]
        D[np.abs(off) <= excl] = np.inf
        j = np.argmin(D, axis=1)
        best_d[r0:r1] = D[np.arange(r1 - r0), j]
        best_j[r0:r1] = j
    dead = ~np.isfinite(best_d)
    best_d[dead] = -1.0
    best_j[dead] = -1
    return best_d, best_j


ZNORM_SCHEMA = "doc_id string, pos int, nn_pos int, d2 double"


def matrix_profile_znorm(
    df: DataFrame,
    m: int = 8,
    excl: int | None = None,
    max_len: int | None = None,
    block: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Z-normalized twin of :func:`matrix_profile` (same distribution
    shape: zero-shuffle mapInPandas, blocked BLAS)."""
    exc = m // 2 if excl is None else excl

    def gen(batches):
        for pdf in batches:
            frames = []
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                a = np.asarray(toks, dtype=np.int64)
                if max_len is not None:
                    a = a[:max_len]
                res = mp_self_znorm(a, m, exc, block)
                if res is None:
                    continue
                dv, jv = res
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": [doc_id] * dv.size,
                            "pos": np.arange(dv.size, dtype=np.int32),
                            "nn_pos": jv.astype(np.int32),
                            "d2": dv,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, tokens_col).mapInPandas(gen, ZNORM_SCHEMA)


# ---------------------------------------------------------------------------
# MP7 — FLUSS semantic segmentation (Gharghabi et al., ICDM 2017): the
# arc curve over the matrix-profile index. Every position's nearest
# neighbor draws an arc (pos -> nn_pos); positions where FEW arcs cross
# are semantic regime boundaries. CAC normalizes the arc count by the
# idealized parabola 2*i*(q-i)/q of a structureless series and clamps
# to [0, 1]; the edge zones (excl_factor * m) are pinned to 1.0 (the
# stumpy/upstream convention) so trivial boundary minima never win.
# ---------------------------------------------------------------------------


def fluss_cac(a: np.ndarray, m: int, excl: int, zone: int):
    """Arc counts + corrected arc curve for one series. Returns
    ``(ac int64[q], cac float64[q])`` with cac floor-1e6 (the shared
    cross-engine grid) or None when the profile is degenerate.

    The float tree is written to match the SQL oracle verbatim:
    ``least(1, ac / ((2*i) * (q-i) / q))`` then floor-1e6; edges exact
    1.0."""
    res = mp_self(np.asarray(a, dtype=np.int64), m, excl)
    if res is None:
        return None
    d2, nn = res
    q = d2.size
    idx = np.arange(q, dtype=np.int64)
    valid = nn >= 0
    lo = np.minimum(idx[valid], nn[valid])
    hi = np.maximum(idx[valid], nn[valid])
    delta = np.zeros(q, dtype=np.int64)
    np.add.at(delta, lo + 1, 1)  # arc covers (lo, hi) exclusive
    np.add.at(delta, hi, -1)
    ac = np.cumsum(delta)
    ii = idx.astype(np.float64)
    qq = float(q)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = ac.astype(np.float64) / ((2.0 * ii) * (qq - ii) / qq)
    cac = np.minimum(1.0, r)
    cac[(idx < zone) | (idx > q - 1 - zone)] = 1.0
    cac = np.floor(cac * 1e6 + 0.5) / 1e6
    return ac, cac


FLUSS_SCHEMA = "doc_id string, pos int, ac long, cac double"


def fluss(
    df: DataFrame,
    m: int = 8,
    excl: int | None = None,
    excl_factor: int = 5,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-series FLUSS arc curve as a DataFrame operator: one row per
    subsequence position ``(doc_id, pos, ac, cac)``. Zero shuffles —
    the profile, arc histogram, and CAC are all inside one mapInPandas
    projection (same scale shape as the rest of the MP family)."""
    exc = m // 2 if excl is None else excl
    zone = excl_factor * m

    def gen(batches):
        for pdf in batches:
            ids: list[str] = []
            pos: list[np.ndarray] = []
            acs: list[np.ndarray] = []
            cacs: list[np.ndarray] = []
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                res = fluss_cac(np.asarray(toks, dtype=np.int64), m, exc, zone)
                if res is None:
                    continue
                ac, cac = res
                ids.extend([doc_id] * ac.size)
                pos.append(np.arange(ac.size, dtype=np.int32))
                acs.append(ac)
                cacs.append(cac)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "pos": np.concatenate(pos),
                    "ac": np.concatenate(acs),
                    "cac": np.concatenate(cacs),
                }
            )

    return df.select(id_col, tokens_col).mapInPandas(gen, FLUSS_SCHEMA)
