"""Property gates for the C5 weight-learning half (weightlearn.py):
discriminative indices get penalized, everything else stays identity,
the learned weights actually separate the classes, and the distributed
featurization equals the local one row for row."""

from __future__ import annotations

import numpy as np
import pytest

from dtaidistance_spark import kernels as K
from dtaidistance_spark import weightlearn as WL


def _corpus(noise=0.05, n=40, per_class=6, seed=11):
    """Class A: flat 0 line with a bump at 8..11; class B: same bump
    PLUS a discriminative spike at 24..27. Deterministic jitter."""
    rng = np.random.default_rng(seed)
    series, labels = [], []
    for cls in (0, 1):
        for _ in range(per_class):
            s = np.zeros(n)
            s[8:12] = 1.0
            if cls == 1:
                s[24:28] = 2.0
            s += rng.normal(0.0, noise, size=n)
            series.append(s)
            labels.append(cls)
    return series, labels


class TestCART:
    def test_perfect_split_and_determinism(self):
        X = np.array([[0.1, 5.0], [0.2, 4.0], [0.9, 5.0], [0.8, 4.5]])
        y = np.array([0, 0, 1, 1])
        t1 = WL.DecisionTreeClassifier(max_depth=2).fit(X, y)
        t2 = WL.DecisionTreeClassifier(max_depth=2).fit(X, y)
        assert t1.root == t2.root  # fully deterministic
        assert list(t1.predict(X)) == [0, 0, 1, 1]
        s = t1.splits()
        assert len(s) == 1 and s[0]["feature"] == 0
        assert 0.2 < s[0]["threshold"] < 0.8
        assert s[0]["gain"] == pytest.approx(1.0)  # perfect split, H=1

    def test_pure_labels_no_split(self):
        X = np.random.default_rng(0).normal(size=(8, 3))
        t = WL.DecisionTreeClassifier().fit(X, np.zeros(8, dtype=int))
        assert t.splits() == [] and t.root == {"leaf": 0}


class TestWeightLearning:
    def test_discriminative_indices_get_penalized(self):
        # window=3 keeps the alignment local so the class-B spike can't
        # warp onto the shared bump (upstream learns banded too)
        series, labels = _corpus()
        w, imp = WL.compute_weights_using_dt(
            series, labels, prototypeidx=0, window=3
        )
        assert w.shape == (40, 4) and imp.shape == (40,)
        # importances concentrate on the spike region 24..27
        spike = range(24, 28)
        assert imp[24:28].sum() > 0.0
        assert imp[24:28].sum() >= 0.99 * imp.sum()
        # the spike is ABOVE the class-0 prototype -> positive side gets
        # a dead zone at the learned margin and a slope > 1
        hot = [m for m in spike if w[m, 3] > 1.0]
        assert hot and all(w[m, 2] > 0.5 for m in hot)
        # untouched indices keep the identity rectifier
        ident = [m for m in range(40) if m not in spike]
        assert all(w[m, 0] == 0 and w[m, 1] == 1 for m in ident)
        assert all(w[m, 2] == 0 and w[m, 3] == 1 for m in ident)

    def test_learned_weights_separate_classes_better(self):
        series, labels = _corpus()
        w, _ = WL.compute_weights_using_dt(
            series, labels, prototypeidx=0, window=3
        )
        proto = np.asarray(series[0])

        def ratio(weights):
            intra = np.mean([
                K.dtw_weighted_distance(proto, s, weights=weights, window=3)
                for s, l in zip(series[1:], labels[1:]) if l == 0
            ])
            inter = np.mean([
                K.dtw_weighted_distance(proto, s, weights=weights, window=3)
                for s, l in zip(series, labels) if l == 1
            ])
            return inter / max(intra, 1e-12)

        assert ratio(w) > ratio(None)  # sharper separation than plain DTW

    def test_same_labels_yield_identity_weights(self):
        series, labels = _corpus()
        w, imp = WL.compute_weights_using_dt(
            series, [0] * len(series), prototypeidx=0
        )
        ident = np.zeros((40, 4))
        ident[:, 1] = 1.0
        ident[:, 3] = 1.0
        assert np.array_equal(w, ident) and imp.sum() == 0.0
        # and identity weights mean the kernel IS plain DTW
        d_w = K.dtw_weighted_distance(series[0], series[1], weights=w)
        d_p = K.dtw_distance(np.asarray(series[0]), np.asarray(series[1]))
        assert d_w == d_p

    def test_compat_surface(self):
        from dtaidistance_spark.compat import dtw_weighted

        series, labels = _corpus()
        w, imp = dtw_weighted.compute_weights_using_dt(
            series, labels, prototypeidx=0
        )
        feats = dtw_weighted.series_to_dt(series, prototypeidx=0)
        assert feats.shape == (len(series), 80)
        assert np.all(feats[0] == 0.0)  # the prototype's own row
        d = dtw_weighted.distance(series[0], series[-1], weights=w)
        assert np.isfinite(d) and d > 0


def test_distributed_features_equal_local(spark):
    series, labels = _corpus()
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [f"s{i:03d}" for i in range(len(series))],
                "tokens": [list(map(float, s)) for s in series],
            }
        )
    )
    proto = np.asarray(series[0])
    got = {
        r["doc_id"]: np.asarray(r["features"])
        for r in WL.features_distributed(df, proto).collect()
    }
    want = WL.series_to_features(series, prototypeidx=0)
    assert len(got) == len(series)
    for i in range(len(series)):
        assert np.array_equal(got[f"s{i:03d}"], want[i]), i
    # training on executor-extracted features gives the same weights
    X = np.asarray([got[f"s{i:03d}"] for i in range(len(series))])
    w1, i1 = WL.compute_weights_using_dt(
        series, labels, prototypeidx=0, features=X
    )
    w2, i2 = WL.compute_weights_using_dt(series, labels, prototypeidx=0)
    assert np.array_equal(w1, w2) and np.array_equal(i1, i2)
