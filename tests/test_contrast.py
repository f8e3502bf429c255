"""Semantic gates for contrast_q (MP10): brute numpy recompute of
both profiles and the clipped contrast for sampled docs, the planted
bench-overlap zero runs, and the honest characteristic-structure
reading."""

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.contrast_q import contrast_profile
from dtaidistance_spark.operators.motif_q import _EXCL, _M, _MAXLEN


def _windows(t, m=_M):
    t = np.asarray(t, dtype=np.int64)
    return np.stack([t[i : i + m] for i in range(len(t) - m + 1)])


def _brute(corpus_tokens, bench_windows, t):
    w = _windows(t)
    n = len(w)
    d2_self = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(n):
        for j in range(n):
            if abs(i - j) > _EXCL:
                d = int(((w[i] - w[j]) ** 2).sum())
                if d < d2_self[i]:
                    d2_self[i] = d
    d2_ab = np.array(
        [min(int(((wi - q) ** 2).sum()) for q in bench_windows) for wi in w]
    )
    return d2_self, d2_ab


def test_matches_brute_and_planted_zeros(spark):
    out = (
        contrast_profile(spark, "").toPandas().set_index(["doc_id", "pos"])
    )
    assert len(out) == 7689
    loc = synth.sequences_local(202).set_index("doc_id")

    def tok(i):
        return loc.loc[f"doc{i:012d}"].tokens.astype(np.int64)

    bench = []
    for i in (3, 7):
        bench.extend(_windows(tok(i)[17:41]))
    for i in (200, 201):
        bench.extend(_windows(tok(i)[:24]))
    assert len(bench) == 68
    for i in (0, 3, 31):
        t = tok(i)[:_MAXLEN]
        d2s, d2a = _brute(None, bench, t)
        doc = f"doc{i:012d}"
        for pos in range(len(d2s)):
            r = out.loc[(doc, pos)]
            assert r.d2_self == d2s[pos], (doc, pos)
            assert r.d2_ab == d2a[pos], (doc, pos)
            assert r.cp2 == max(0, int(d2a[pos]) - int(d2s[pos]))
    # the planted runs: doc 3 feeds the benchmark verbatim at token
    # positions 17..40, so windows 17..33 have d2_ab = 0 ⇒ CP² = 0
    for pos in range(17, 34):
        r = out.loc[("doc000000000003", pos)]
        assert r.d2_ab == 0 and r.cp2 == 0


def test_honest_characteristic_structure(spark):
    out = contrast_profile(spark, "").toPandas()
    # measured: only ~2.2% of windows are bench-covered (CP² = 0);
    # the rest carry huge contrast — the corpus's periodic structure
    # repeats internally and 4 bench series cannot cover it
    z = (out.cp2 == 0).mean()
    assert 0.005 < z < 0.10
    assert out.cp2.median() > 1e8
