"""Semantic gates for phillipsperron_q (TS115): numpy recompute per
doc, the simulation calibration trio that validated the derived
correction, iid degeneracy, t-equality with adf_unit_root, and the
corpus move-but-no-flip reading."""

import math

import numpy as np

from dtaidistance_spark.operators.phillipsperron_q import (
    _Q,
    phillips_perron,
)
from dtaidistance_spark.operators.stationarity_q import adf_unit_root
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _pp_ref(y, q=_Q):
    y = np.asarray(y, dtype=np.float64)
    x = y[:-1]
    d = np.diff(y)
    m = len(d)
    X = np.column_stack([np.ones(m), x])
    beta, *_ = np.linalg.lstsq(X, d, rcond=None)
    u = d - X @ beta
    s2 = (u @ u) / (m - 2)
    Qv = np.sum((x - x.mean()) ** 2)
    se = math.sqrt(s2 / Qv)
    t = beta[1] / se
    # mirror the engine's 1e-4 residual pin (the FMA-drift fix)
    u6 = np.floor(u * 1e4 + 0.5) / 1e4
    g = [float(u6[j:] @ u6[: m - j]) / m for j in range(q + 1)]
    lam2 = g[0] + 2 * sum(
        (1 - j / (q + 1)) * g[j] for j in range(1, q + 1)
    )
    if lam2 <= 0:
        lam2 = g[0]
    z = math.sqrt(g[0] / lam2) * t - (lam2 - g[0]) * m / (
        2 * math.sqrt(lam2) * math.sqrt(Qv)
    )
    return t, g[0], lam2, z


def test_matches_numpy(spark, sf_dir):
    out = (
        phillips_perron(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(0, 512, 61):
        doc_id, tokens, n, _, _ = gen_row(i)
        t, g0, lam2, z = _pp_ref(tokens)
        row = out.loc[doc_id]
        assert abs(row.t_df - f6(t)) < 1e-4
        assert abs(row.gamma0 - f6(g0)) < 1e-3
        assert abs(row.lambda2 - f6(lam2)) < 1e-3
        assert abs(row.z_pp - f6(z)) < 1e-3


def _lcg_normal(seed, n):
    """Deterministic ~normal stream (sum of 12 uniforms − 6)."""
    s = seed
    out = np.empty(n)
    for i in range(n):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out


def test_calibration_trio():
    # (1) true-λ² size ≈ nominal under MA(−0.5) unit root — the gate
    # that caught the spurious 1/s factor in the draft formula
    R, T = 80, 1500
    rej_true = 0
    for r in range(R):
        e = _lcg_normal(1000 + r, T + 1)
        u = e[1:] - 0.5 * e[:-1]
        y = np.cumsum(u)
        x = y[:-1]
        d = np.diff(y)
        m = len(d)
        X = np.column_stack([np.ones(m), x])
        beta, *_ = np.linalg.lstsq(X, d, rcond=None)
        res = d - X @ beta
        g0 = float(res @ res) / m
        Qv = np.sum((x - x.mean()) ** 2)
        s2 = (res @ res) / (m - 2)
        t = beta[1] / math.sqrt(s2 / Qv)
        lam2 = 0.25  # TRUE long-run variance of MA(−0.5) with σ² = 1
        z = math.sqrt(g0 / lam2) * t - (lam2 - g0) * m / (
            2 * math.sqrt(lam2) * math.sqrt(Qv)
        )
        rej_true += z < -2.86
    assert rej_true / R < 0.15  # ≈ 5% nominal; draft form gave 23%
    # (2) iid RW size ≈ nominal, (3) AR(0.9) power ≈ 1
    rej = pw = 0
    for r in range(40):
        y = np.cumsum(_lcg_normal(5000 + r, 1200))
        _, _, _, z = _pp_ref(y)
        rej += z < -2.86
        e = _lcg_normal(7000 + r, 1200)
        ar = np.zeros(1200)
        for i in range(1, 1200):
            ar[i] = 0.9 * ar[i - 1] + e[i]
        _, _, _, z2 = _pp_ref(ar)
        pw += z2 < -2.86
    assert rej / 40 < 0.2
    assert pw / 40 == 1.0


def test_iid_degeneracy():
    # white errors ⇒ λ² ≈ γ0 ⇒ Z_t ≈ t
    y = np.cumsum(_lcg_normal(99, 3000))
    t, g0, lam2, z = _pp_ref(y)
    assert abs(lam2 / g0 - 1) < 0.1
    assert abs(z - t) < 0.25


def test_t_equality_and_no_flip(spark, sf_dir):
    pp = (
        phillips_perron(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    adf = (
        adf_unit_root(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # the PP regression layer IS TS63's: t bit-equal on every doc
    assert (pp.t_df - adf.t_stat).abs().max() == 0.0
    # corpus reads: correction moves, verdicts hold
    move = (pp.z_pp - pp.t_df).abs()
    assert move.median() > 1.0
    assert move.max() > 20
    assert (
        pp.reject_unit_root_pp == adf.reject_unit_root
    ).all()
    assert int(pp.reject_unit_root_pp.sum()) == 503
    lamr = (pp.lambda2 / pp.gamma0 - 1).abs()
    assert int((lamr > 0.05).sum()) >= 450  # real serial correlation
