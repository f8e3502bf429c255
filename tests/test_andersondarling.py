"""Semantic gates for andersondarling_q (TS126): both exact
enumerations (null mean ≡ k−1 = 1 for midrank AND continuous
versions; the Scholz–Stephens σ²_N EXACTLY equals the continuous
version's full-permutation variance), a numpy recompute of every
emitted column (exercising the tie-midrank algebra on the real tied
data), planted location/tail alternatives firing, and the measured
corpus pins — books–code rejecting through the tail-weighted
functional where the rank family read null."""

import collections
import itertools
import math

import numpy as np

from dtaidistance_spark.operators.andersondarling_q import (
    _N,
    anderson_darling_sources,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _a2_midrank(x, y):
    pooled = sorted(set(x) | set(y))
    N = len(x) + len(y)
    na, nb = len(x), len(y)
    cx, cy = collections.Counter(x), collections.Counter(y)
    pa = pb = pl = 0
    sa = sb = 0.0
    nv = 0
    for v in pooled:
        fa, fb = cx.get(v, 0), cy.get(v, 0)
        l = fa + fb
        m2a = 2 * pa + fa
        m2b = 2 * pb + fb
        b2 = 2 * pl + l
        den = b2 * (2 * N - b2) - N * l
        if den > 0:
            sa += l * (N * m2a - na * b2) ** 2 / den
            sb += l * (N * m2b - nb * b2) ** 2 / den
        pa += fa
        pb += fb
        pl += l
        nv += 1
    return (N - 1) / N**2 * (sa / na + sb / nb), nv


def _a2_plain(x, y):
    import bisect

    pooled = sorted(x + y)
    N = len(pooled)
    na, nb = len(x), len(y)
    sx, sy = sorted(x), sorted(y)
    sa = sb = 0.0
    for j in range(1, N):
        z = pooled[j - 1]
        ma = bisect.bisect_right(sx, z)
        mb = bisect.bisect_right(sy, z)
        sa += (N * ma - j * na) ** 2 / (j * (N - j))
        sb += (N * mb - j * nb) ** 2 / (j * (N - j))
    return (sa / na + sb / nb) / N


def _sigma2(N, na, nb):
    k = 2
    H = 1 / na + 1 / nb
    h = sum(1 / i for i in range(1, N))
    g = sum(
        1 / (N - i) * sum(1 / j for j in range(i + 1, N))
        for i in range(1, N - 1)
    )
    a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * H
    b = (
        (2 * g - 4) * k**2
        + 8 * h * k
        + (2 * g - 14 * h - 4) * H
        - 8 * h
        + 4 * g
        - 6
    )
    c = (
        (6 * h + 2 * g - 2) * k**2
        + (4 * h - 4 * g + 6) * k
        + (2 * h - 6) * H
        + 4 * h
    )
    d = (2 * h + 6) * k**2 - 4 * h * k
    return (a * N**3 + b * N**2 + c * N + d) / (
        (N - 1) * (N - 2) * (N - 3)
    )


def _enumerate(nvals, pick, stat):
    vals = list(range(1, nvals + 1))
    out = []
    for combo in itertools.combinations(range(nvals), pick):
        y = [vals[i] for i in combo]
        x = [vals[i] for i in range(nvals) if i not in combo]
        out.append(stat(x, y))
    return np.array(out)


def test_null_mean_is_exactly_one_both_versions():
    mid = _enumerate(7, 3, lambda x, y: _a2_midrank(x, y)[0])
    plain = _enumerate(7, 3, _a2_plain)
    assert abs(mid.mean() - 1.0) < 1e-12
    assert abs(plain.mean() - 1.0) < 1e-12


def test_sigma_formula_exact_for_continuous_version():
    for nvals, pick in ((7, 3), (10, 4)):
        plain = _enumerate(nvals, pick, _a2_plain)
        na, nb = nvals - pick, pick
        assert abs(plain.var(ddof=0) - _sigma2(nvals, na, nb)) < 1e-10


def test_matches_numpy_on_corpus(spark, sf_dir):
    from dtaidistance_spark import synth

    out = (
        anderson_darling_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    pdf = synth.gen_pdf(range(_N))[["source", "n_tok"]]
    groups = {
        s: list(g.n_tok.astype(int)) for s, g in pdf.groupby("source")
    }
    srcs = sorted(groups)
    for a, b in itertools.combinations(srcs, 2):
        x, y = groups[a], groups[b]
        a2, nv = _a2_midrank(x, y)
        N = len(x) + len(y)
        sig = math.sqrt(_sigma2(N, len(x), len(y)))
        t = (a2 - 1.0) / sig
        row = out.loc[(a, b)]
        assert row.na == len(x) and row.nb == len(y)
        assert row.n_pooled == N and row.n_blocks == nv
        assert abs(row.a2_akn - f6(a2)) < 1e-6
        assert abs(row.sigma_n - f6(sig)) < 1e-6
        assert abs(row.t_stat - f6(t)) < 1e-6
        assert row.reject_same_dist == int(t >= 1.960)


def test_corpus_pins(spark, sf_dir):
    out = (
        anderson_darling_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    # measured: books is the tiny heavy-tailed cell (T74's finding),
    # recovered here from RANKS by the tail weighting; code-web null
    assert abs(out.loc[("books", "code")].t_stat - 2.371683) < 1e-6
    assert abs(out.loc[("books", "web")].t_stat - 1.943006) < 1e-6
    assert abs(out.loc[("code", "web")].t_stat - (-0.429931)) < 1e-6
    assert out.reject_same_dist.tolist() == [1, 0, 0]


def test_planted_alternatives_fire():
    rng = np.random.RandomState(5)
    base = list(rng.randint(100, 200, size=150))
    shifted = list(rng.randint(160, 260, size=150))
    a2, _ = _a2_midrank(base, shifted)
    t = (a2 - 1.0) / math.sqrt(_sigma2(300, 150, 150))
    assert t > 1.96  # location shift fires
    # tail inflation at matched median: mix 15% huge values
    heavy = list(rng.randint(100, 200, size=128)) + list(
        rng.randint(500, 5000, size=22)
    )
    a2h, _ = _a2_midrank(base, heavy)
    th = (a2h - 1.0) / math.sqrt(_sigma2(300, 150, 150))
    assert th > 1.96  # the tail-weighted dial fires


def test_tie_midrank_hand_case():
    """x = [1, 1, 2], y = [1, 2, 2]: every block fully tied across
    samples — verify the doubled-midrank algebra against a direct
    half-count computation."""
    x, y = [1, 1, 2], [1, 2, 2]
    a2, nv = _a2_midrank(x, y)
    # direct: blocks z=1 (fa=2, fb=1, l=3), z=2 (fa=1, fb=2, l=3); N=6
    N, na = 6, 3
    # block 1: Ma = 1.0 (0 + 2/2), B = 1.5; block 2: Ma = 2.5, B = 4.5
    t1 = 3 * (N * 1.0 - na * 1.5) ** 2 / (1.5 * (N - 1.5) - N * 3 / 4)
    t2 = 3 * (N * 2.5 - na * 4.5) ** 2 / (4.5 * (N - 4.5) - N * 3 / 4)
    expect = (N - 1) / N**2 * (2 * (t1 + t2) / 3)  # symmetric samples
    assert nv == 2
    assert abs(a2 - expect) < 1e-12
