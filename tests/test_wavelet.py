"""Semantic gates for wavelet_q (cross-engine hash in test_oracle.py):
an independent numpy Haar recompute of every level's coefficients and
energies, the exact Parseval flag on every row, and share accounting."""

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.wavelet_q import _L, _N, _W, haar_dwt_energy


def _haar_ref(x):
    """Plain numpy unnormalized Haar: returns (approx, [e1..e6], ssq)."""
    a = np.asarray(x[:_W], dtype=np.int64)
    energies = []
    for _ in range(_L):
        d = a[0::2] - a[1::2]
        a = a[0::2] + a[1::2]
        energies.append(int((d.astype(object) ** 2).sum()))
    return int(a[0]), energies, int((np.asarray(x[:_W], dtype=np.int64) ** 2).sum())


def test_haar_matches_numpy_and_parseval(spark, sf_dir):
    out = haar_dwt_energy(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    # Parseval holds as an exact int64 equality on EVERY row
    assert (out["parseval_ok"] == 1).all()
    assert (out["lhs"] == out["rhs"]).all()
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::5]:
        got = out.loc[row.doc_id]
        approx, energies, ssq = _haar_ref(row.tokens)
        assert int(got["approx"]) == approx
        for l in range(1, _L + 1):
            assert int(got[f"e{l}"]) == energies[l - 1], (row.doc_id, l)
        assert int(got["lhs"]) == _W * ssq
        # shares sum to 1 (within the 6 floor-1e6 roundings)
        fr = sum(got[f"frac{l}"] for l in range(1, _L + 1))
        assert abs(fr - 1.0) < 1e-5
        # energies positive somewhere: series are never flat
        assert sum(energies) > 0
