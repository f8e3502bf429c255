"""Semantic gates for burrows_q (T88): full pandas/Counter recompute
of all 190 deltas, the metric invariants, the planted
function-word-shifted source separating decisively, and the honest
same-style band centered on 2/√π."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.burrows_q import (
    _K,
    burrows_delta_sources,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _delta_ref(texts_by_source, k=_K):
    """Counter/numpy route: top-k words (global count, word-asc
    tiebreak), spine-complete relative freqs, population-σ z-scores,
    pairwise mean |Δz|."""
    cnt = {
        s: Counter(" ".join(ts).lower().split(" "))
        for s, ts in texts_by_source.items()
    }
    glob = Counter()
    for c in cnt.values():
        glob.update(c)
    top = sorted(glob, key=lambda w: (-glob[w], w))[:k]
    sources = sorted(cnt)
    fmat = np.array(
        [
            [
                round(cnt[s][w] / sum(cnt[s].values()), 12)
                for w in sorted(top)
            ]
            for s in sources
        ]
    )
    mu = fmat.mean(axis=0)
    sd = fmat.std(axis=0)
    z = (fmat - mu) / sd
    out = {}
    for i, a in enumerate(sources):
        for j, b in enumerate(sources):
            if a < b:
                out[(a, b)] = np.abs(z[i] - z[j]).mean()
    return out


def _texts(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return {
        s: g.text.tolist() for s, g in raw.groupby("source")
    }


def test_matches_pandas(spark, sf_dir):
    out = burrows_delta_sources(spark, sf_dir).toPandas()
    ref = _delta_ref(_texts(sf_dir))
    assert len(out) == len(ref) == 190
    for row in out.itertuples():
        want = ref[(row.source_a, row.source_b)]
        assert abs(row.delta - f6(want)) < 1e-5


def test_metric_invariants():
    texts = _texts("/root/testdata/sf0.001")
    ref = _delta_ref(texts)
    keys = sorted(texts)
    # triangle inequality for the z-L1/K metric on a sample of triples
    for a, b, c in [
        (keys[0], keys[1], keys[2]),
        (keys[3], keys[7], keys[11]),
        (keys[2], keys[9], keys[15]),
    ]:
        ab = ref[tuple(sorted((a, b)))]
        bc = ref[tuple(sorted((b, c)))]
        ac = ref[tuple(sorted((a, c)))]
        assert ac <= ab + bc + 1e-12


def test_planted_style_shift_separates():
    texts = _texts("/root/testdata/sf0.001")
    # plant a source that overuses one common function word 5×
    top_word = "the"
    base = _delta_ref(texts)
    shifted = dict(texts)
    shifted["zz_planted"] = [
        (t + (" " + top_word) * (len(t.split()) // 2))
        for t in texts[sorted(texts)[0]]
    ]
    ref = _delta_ref(shifted)
    planted = [v for (a, b), v in ref.items() if "zz_planted" in (a, b)]
    same = [v for (a, b), v in ref.items() if "zz_planted" not in (a, b)]
    assert min(planted) > max(same)


def test_honest_same_pen_band(spark):
    out = burrows_delta_sources(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert (out.k_words == _K).all()
    # one band centered near the same-style expectation 2/√π ≈ 1.128
    assert abs(out.delta.mean() - 2 / math.sqrt(math.pi)) < 0.15
    assert out.delta.min() > 0.4
    assert out.delta.max() < 2.0
    # no outlying pair: max is within ~50% of the mean
    assert out.delta.max() < 1.6 * out.delta.mean()
