"""TS72 — Hodrick-Prescott trend/cycle decomposition per series
(Hodrick & Prescott JMCB'97; Whittaker 1923 graduation): THE classic
smooth-trend extractor — find τ minimizing

    Σ (y_t − τ_t)² + λ · Σ (τ_{t+1} − 2τ_t + τ_{t−1})²

whose closed form is the linear solve (I + λ·DᵀD)·τ = y with D the
second-difference operator.  Complements the decomposition family:
seasonal_decompose (TS16) splits by a KNOWN period, Butterworth (S2)
filters a KNOWN band, PELT (TS71) fits PIECEWISE-constant means; HP
extracts a smooth trend with one smoothness dial (λ = 1600, the
canonical quarterly value, declared).

Implementation: an Arrow mapInPandas kernel at cap L = 512 — the
pentadiagonal system is solved DENSE per series (numpy Cholesky path;
512³ flops ≈ 5 ms/series, embarrassingly parallel, zero exchanges).
Rows-only in the driver artifact (a matrix solve is not ANSI SQL);
pytest gates the OPTIMALITY CONDITION directly — the gradient
(τ − y) + λ·DᵀDτ must vanish elementwise — plus the exact variance
decomposition ‖y − ȳ‖² = ‖τ − ȳ‖² + ‖c‖² + 2⟨τ − ȳ, c⟩ with the
cross-term pinned, and the two λ limits (λ→0 ⇒ τ = y; λ→∞ ⇒ the OLS
line, checked against the TS61 closed-form slope).

Output per series: n, the floored trend checksum Σ|τ|, cycle energy
Σc², smoothness Σ(Δ²τ)², the trend's share of total variance, and
first/last trend values — a compact audit row instead of 512 doubles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register

_N = 512
_CAP = 512
_LAM = 1600.0


def _dtd(n: int) -> np.ndarray:
    d = np.zeros((n - 2, n))
    for i in range(n - 2):
        d[i, i], d[i, i + 1], d[i, i + 2] = 1.0, -2.0, 1.0
    return d.T @ d


def hp_trend(y: np.ndarray, lam: float = _LAM) -> np.ndarray:
    n = len(y)
    if n < 3:
        return y.astype(np.float64)
    a = np.eye(n) + lam * _dtd(n)
    return np.linalg.solve(a, y.astype(np.float64))


@register("hp_filter")
def hp_filter(spark, sf_dir):
    """TS72: Hodrick-Prescott decomposition per series (module
    header) — dense per-series solve in an Arrow kernel, compact
    audit row, zero exchanges."""
    docs = synth.sequences_df(spark, _N).selectExpr(
        "doc_id",
        f"slice(tokens, 1, least(n_tok, {_CAP})) AS v",
    )

    def kern(batches):
        f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        for pdf in batches:
            rows = []
            for doc_id, v in zip(pdf["doc_id"], pdf["v"]):
                y = np.asarray(v, dtype=np.float64)
                n = len(y)
                tau = hp_trend(y)
                c = y - tau
                d2 = np.diff(tau, 2)
                tv = float(((tau - tau.mean()) ** 2).sum())
                yv = float(((y - y.mean()) ** 2).sum())
                rows.append(
                    (
                        doc_id,
                        n,
                        f6(float(np.abs(tau).sum())),
                        f6(float((c * c).sum())),
                        f6(float((d2 * d2).sum())),
                        f6(tv / yv if yv > 0 else 0.0),
                        f6(float(tau[0])),
                        f6(float(tau[-1])),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "l",
                    "trend_checksum",
                    "cycle_energy",
                    "smoothness",
                    "trend_var_share",
                    "trend_first",
                    "trend_last",
                ],
            )

    return docs.mapInPandas(
        kern,
        schema=(
            "doc_id string, l long, trend_checksum double,"
            " cycle_energy double, smoothness double,"
            " trend_var_share double, trend_first double,"
            " trend_last double"
        ),
    )
