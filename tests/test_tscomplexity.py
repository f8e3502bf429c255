"""Semantic gates for tscomplexity_q (cross-engine hashes live in
test_oracle.py): permutation entropy vs a naive numpy ordinal-pattern
counter on every synthetic series, plus the structure-vs-noise
separation PE exists to provide."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tscomplexity_q import _N, _PIDS, perm_entropy


@pytest.fixture(scope="module")
def loc():
    return synth.sequences_local(_N)


def _naive_pe(x):
    """Bandt-Pompe order-3 counts with ties-to-earlier-position, plus
    the same floor-1e6 entropy the engine emits."""
    counts = {p: 0 for p in _PIDS}
    n = len(x)
    for w in range(n - 2):
        win = x[w : w + 3]
        r = []
        for i in range(3):
            r.append(
                sum(
                    1
                    for j in range(3)
                    if win[j] < win[i] or (win[j] == win[i] and j < i)
                )
            )
        counts[r[0] * 9 + r[1] * 3 + r[2]] += 1
    nw = n - 2
    raw = -sum(
        (c / nw) * math.log(c / nw) for c in counts.values() if c > 0
    )
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    return counts, nw, f6(raw), f6(raw / math.log(6.0))


def test_perm_entropy_matches_naive_recompute(spark, sf_dir, loc):
    out = perm_entropy(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    for row in loc.itertuples():
        counts, nw, pe, pe_norm = _naive_pe(row.tokens.tolist())
        got = out.loc[row.doc_id]
        assert got.nw == nw, row.doc_id
        for p in _PIDS:
            assert got[f"c{p}"] == counts[p], (row.doc_id, p)
        assert got.pe == pytest.approx(pe, abs=2e-6), row.doc_id
        assert got.pe_norm == pytest.approx(pe_norm, abs=2e-6), row.doc_id


def test_perm_entropy_separates_structure_from_noise(spark, sf_dir, loc):
    """The modular-ramp series are strongly structured; a hashed
    control of the same values is noise-like. PE must separate them:
    every synthetic series' normalized PE sits below the noise
    control's, and the noise control saturates near 1."""
    out = perm_entropy(spark, sf_dir).toPandas()
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 50257, size=4096)
    _, _, _, noise_norm = _naive_pe(noise.tolist())
    assert noise_norm > 0.99
    assert out["pe_norm"].max() < noise_norm
    assert (out["pe_norm"] <= 1.0 + 1e-9).all()
    assert (out["pe"] >= 0.0).all()


def test_sliding_distinct_matches_set_recompute(spark, sf_dir):
    from dtaidistance_spark.operators.tscomplexity_q import (
        _NW,
        _W,
        sliding_distinct_tokens,
    )

    out = sliding_distinct_tokens(spark, sf_dir).toPandas()
    loc = synth.sequences_local(_NW)
    grp = {d: g.set_index("pos")["n_distinct"] for d, g in out.groupby("doc_id")}
    checked = 0
    for row in list(loc.itertuples())[::7]:  # every 7th doc, full curve
        toks = row.tokens.tolist()
        got = grp[row.doc_id]
        assert len(got) == len(toks) - _W + 1
        for i in range(_W - 1, len(toks)):
            assert got.loc[i] == len(set(toks[i - _W + 1 : i + 1])), (
                row.doc_id,
                i,
            )
            checked += 1
    assert checked > 5000
    assert (out["n_distinct"] >= 1).all() and (out["n_distinct"] <= _W).all()


# ---------------------------------------------------------------------------
# Hurst R/S (TS40)
# ---------------------------------------------------------------------------


def _naive_rs(x, w):
    """Classic rescaled-range over disjoint blocks, numpy route (floats
    from the start — an INDEPENDENT path from the engine's scaled-int
    algebra)."""
    x = np.asarray(x, dtype=np.float64)
    nb = len(x) // w
    vals = []
    for b in range(nb):
        blk = x[b * w : (b + 1) * w]
        dev = blk - blk.mean()
        z = np.cumsum(dev)
        r = max(z.max(), 0.0) - min(z.min(), 0.0)
        s = math.sqrt((dev**2).mean())
        if s > 0:
            vals.append(r / s)
    return (sum(vals) / len(vals)) if vals else None


def test_hurst_rs_matches_numpy(spark, sf_dir):
    from dtaidistance_spark.operators.tscomplexity_q import _HWS, hurst_rs

    out = hurst_rs(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    lws = [math.log(w) for w in _HWS]
    mx = sum(lws) / 4
    sxx = sum((lx - mx) ** 2 for lx in lws)
    for row in list(loc.itertuples())[::5]:
        got = out.loc[row.doc_id]
        rs = {w: _naive_rs(row.tokens, w) for w in _HWS}
        for w in _HWS:
            assert got[f"rs_{w}"] == pytest.approx(rs[w], rel=1e-9, abs=2e-6)
        lys = [math.log(rs[w]) for w in _HWS]
        my = sum(lys) / 4
        h = sum((lx - mx) * (ly - my) for lx, ly in zip(lws, lys)) / sxx
        assert got["hurst"] == pytest.approx(h, rel=1e-7, abs=2e-6)
        # R/S of any block is >= sqrt(w)-ish lower ranges; sanity band:
        # a bounded modular ramp is not a pure random walk, but H must
        # land in the physically meaningful [0, 1.5] band and rs must
        # grow with w (long-range structure from the period-64 season)
        assert 0.0 < h < 1.5
        assert rs[8] < rs[64]
