"""Semantic gates for mse_q (TS128): numpy recompute at every scale
per sampled doc, the block-sums-vs-means tolerance equivalence, the
τ=1 ≡ TS44 identity on a shared window, white-noise vs structured
controls (MSE falls with τ on noise, climbs here), and corpus pins."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.mse_q import (
    _CAP,
    _EPS,
    _N,
    _SCALES,
    multiscale_entropy,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _sampen_counts(w, eps):
    """R-M m=2 A/B counts, i < j over the shared n-2 positions."""
    n = len(w)
    nt = n - 2
    a_cnt = b_cnt = 0
    for i in range(nt):
        for j in range(i + 1, nt):
            if max(
                abs(w[i] - w[j]), abs(w[i + 1] - w[j + 1])
            ) <= eps:
                b_cnt += 1
                if abs(w[i + 2] - w[j + 2]) <= eps:
                    a_cnt += 1
    return b_cnt, a_cnt


def _mse_np(tokens):
    v = [int(t) for t in tokens[:_CAP]]
    out = {}
    for tau in _SCALES:
        ncg = len(v) // tau
        w = [sum(v[k * tau : (k + 1) * tau]) for k in range(ncg)]
        b, a = _sampen_counts(w, tau * _EPS)
        se = (
            -math.log(a / b)
            if a > 0 and b > 0 and ncg >= 4
            else None
        )
        out[tau] = (ncg, b, a, se)
    return out


def test_matches_numpy(spark, sf_dir):
    out = (
        multiscale_entropy(spark, sf_dir)
        .toPandas()
        .set_index(["doc_id", "scale"])
    )
    pdf = synth.gen_pdf(range(0, _N, 97))
    for row in pdf.itertuples():
        want = _mse_np(list(row.tokens))
        for tau, (ncg, b, a, se) in want.items():
            got = out.loc[(row.doc_id, tau)]
            assert (got.n_cg, got.b_cnt, got.a_cnt) == (ncg, b, a)
            if se is None:
                assert np.isnan(got.sampen)
            else:
                assert abs(got.sampen - f6(se)) < 1e-6


def test_sums_vs_means_equivalence():
    """Chebyshev on block MEANS with r == on block SUMS with tau*r
    (exactly, including boundary-equal cases constructed to land ON
    the tolerance)."""
    rng = np.random.RandomState(3)
    v = list(rng.randint(0, 5000, size=96))
    tau = 4
    ncg = len(v) // tau
    sums = [sum(v[k * tau : (k + 1) * tau]) for k in range(ncg)]
    means = [s / tau for s in sums]
    b_s, a_s = _sampen_counts(sums, tau * _EPS)
    b_m, a_m = _sampen_counts(means, _EPS)
    assert (b_s, a_s) == (b_m, a_m)
    # boundary: block sums exactly tau*eps apart (lands ON the edge)
    w = [0, tau * _EPS, 0, tau * _EPS, 0, tau * _EPS]
    b1, _ = _sampen_counts(w, tau * _EPS)
    b2, _ = _sampen_counts([x / tau for x in w], _EPS)
    assert b1 == b2 and b1 > 0


def test_tau1_convention_matches_ts44():
    """Same R-M convention as TS44: n−2 shared template positions
    (TS44's _NT = 62 at n = 64), epsilon 1000, i < j — verified by a
    vectorized recompute agreeing with the loop on a 64-token doc."""
    from dtaidistance_spark.operators.rqa_q import _EPS as TS44_EPS
    from dtaidistance_spark.operators.rqa_q import _NT

    assert _NT == 62 and TS44_EPS == _EPS
    rng = np.random.RandomState(5)
    v = rng.randint(0, 4000, size=64).astype(np.int64)
    b, a = _sampen_counts(list(v), _EPS)
    nt = 62
    d = np.abs(v[:, None] - v[None, :])
    m2 = np.maximum(d[:nt, :nt], d[1 : nt + 1, 1 : nt + 1]) <= _EPS
    m3 = m2 & (d[2 : nt + 2, 2 : nt + 2] <= _EPS)
    iu = np.triu_indices(nt, 1)
    assert b == int(m2[iu].sum()) and a == int(m3[iu].sum())


def test_white_noise_falls_structured_climbs():
    rng = np.random.RandomState(11)
    noise = list(rng.randint(0, 50257, size=_CAP))
    mse_n = _mse_np(noise)
    # white noise: entropy non-increasing overall (tau=8 << tau=1 is
    # the Costa signature; allow None at deep scales = max entropy)
    se1 = mse_n[1][3]
    se8 = mse_n[8][3]
    if se8 is not None and se1 is not None:
        assert se8 <= se1 + 0.3
    # the corpus climbs instead (measured; checked on one doc)
    doc = synth.gen_pdf([0]).tokens.iloc[0]
    mse_s = _mse_np(list(doc))
    if mse_s[1][3] is not None and mse_s[4][3] is not None:
        assert mse_s[4][3] > mse_s[1][3]


def test_corpus_pins(spark, sf_dir):
    out = multiscale_entropy(spark, sf_dir).toPandas()
    assert len(out) == _N * len(_SCALES)
    med = out.groupby("scale").sampen.median()
    assert abs(med[1] - 0.053809) < 1e-5
    assert abs(med[8] - 0.807651) < 1e-5
    assert med[1] < med[2] < med[4] < med[8]  # the climbing ladder
    piv = out.pivot_table(
        index="doc_id", columns="scale", values="sampen"
    )
    assert (piv.idxmin(axis=1) == 1).sum() == 502
    assert int(out.sampen.isna().sum()) == 34
