"""Semantic gates for pacf_q (TS67): full Levinson-Durbin numpy
recompute (generic recursion, not the unrolled forms) for a stride of
series, the AR signature honest reading, and an AR(2)-generated hand
case where PACF must cut off after lag 2."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.pacf_q import _N, pacf_yule_walker

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _acf(y, kmax):
    yc = y - y.mean()
    den = float((yc**2).sum())
    return [float((yc[: len(y) - k] * yc[k:]).sum()) / den
            for k in range(1, kmax + 1)]


def _durbin(r):
    """Generic Levinson-Durbin: returns pacf list and last-level phi."""
    pacf = [r[0]]
    phi = [r[0]]
    for k in range(2, len(r) + 1):
        num = r[k - 1] - sum(phi[j] * r[k - 2 - j] for j in range(k - 1))
        den = 1.0 - sum(phi[j] * r[j] for j in range(k - 1))
        pk = num / den
        phi = [phi[j] - pk * phi[k - 2 - j] for j in range(k - 1)] + [pk]
        pacf.append(pk)
    return pacf, phi


def test_matches_numpy(spark, sf_dir):
    out = pacf_yule_walker(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    sig1 = 0
    for i in range(0, _N, 7):
        row = loc.iloc[i]
        y = row.tokens.astype(np.float64)
        n = len(y)
        r = _acf(y, 4)
        got = out.loc[row.doc_id]
        for k in range(1, 5):
            assert abs(got[f"r{k}"] - f6(r[k - 1])) < 1e-6
        pacf, _ = _durbin(r)
        assert abs(got.pacf1 - f6(pacf[0])) < 1e-6
        assert abs(got.pacf2 - f6(pacf[1])) < 1e-6
        assert abs(got.pacf3 - f6(pacf[2])) < 2e-6
        assert abs(got.pacf4 - f6(pacf[3])) < 2e-5
        # Yule-Walker AR(2) = level-2 coefficients
        _, phi2 = _durbin(r[:2])
        assert abs(got.ar2_a1 - f6(phi2[0])) < 1e-6
        assert abs(got.ar2_a2 - f6(phi2[1])) < 1e-6
        vr = 1.0 - phi2[0] * r[0] - phi2[1] * r[1]
        assert abs(got.var_ratio - f6(vr)) < 1e-6
        bart = 1.96 / math.sqrt(n)
        assert got.sig1 == (1 if abs(pacf[0]) > bart else 0)
        sig1 += int(got.sig1)
    # honest reading: smooth AR-like series → lag-1 PACF significant
    # almost everywhere (the TS66 fast-wrapping sawtooths decorrelate
    # and land inside the band) and the AR(2) fit explains almost all
    assert sig1 >= 0.9 * len(range(0, _N, 7))
    # var_ratio spans the corpus honestly: near zero on the smooth
    # unwrapped docs (AR(2) explains nearly everything), large on the
    # decorrelated sawtooths; always inside [0, 1] up to float dust
    assert float(out.var_ratio.min()) < 0.1
    assert 0.3 < float(out.var_ratio.median()) < 0.95
    assert out.var_ratio.between(-1e-9, 1.0 + 1e-9).all()


def test_ar2_cutoff_hand_case():
    # exact AR(2) process: PACF(1), PACF(2) big; PACF(3), PACF(4)
    # inside the Bartlett band — the Box-Jenkins cutoff signature
    rng = np.random.RandomState(11)
    n = 20000
    y = np.zeros(n)
    for t in range(2, n):
        y[t] = 0.6 * y[t - 1] - 0.3 * y[t - 2] + rng.randn()
    r = _acf(y[1000:], 4)
    pacf, _ = _durbin(r)
    bart = 1.96 / math.sqrt(n - 1000)
    assert abs(pacf[0]) > 10 * bart and abs(pacf[1]) > 10 * bart
    assert abs(pacf[2]) < 3 * bart and abs(pacf[3]) < 3 * bart
    # and the Yule-Walker estimates recover the true coefficients
    _, phi2 = _durbin(r[:2])
    assert abs(phi2[0] - 0.6) < 0.05 and abs(phi2[1] + 0.3) < 0.05
