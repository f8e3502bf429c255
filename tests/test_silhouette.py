"""Semantic gates for silhouette_q (T69): full numpy silhouette
recompute + the label-coherence audit reading."""

import math

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.operators.silhouette_q import silhouette_labels

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def ref(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(d.embedding.values).astype(np.float64)
    ids = d.vec_id.to_numpy()
    labs = d.label.to_numpy()
    D = np.sqrt(((V[:, None, :] - V[None, :, :]) ** 2).sum(-1))
    out = {}
    for i in range(len(ids)):
        same = (labs == labs[i]) & (np.arange(len(ids)) != i)
        a = D[i, same].mean()
        bs = {}
        for lb in np.unique(labs):
            if lb == labs[i]:
                continue
            bs[lb] = D[i, labs == lb].mean()
        nl = min(bs, key=lambda k: (bs[k], k))
        b = bs[nl]
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        out[int(ids[i])] = (int(labs[i]), int(nl), a, b, s)
    return out


def test_matches_numpy(spark, sf_dir, ref):
    out = silhouette_labels(spark, sf_dir).toPandas().set_index(
        "vec_id"
    )
    assert len(out) == len(ref)
    for vid, (lab, nl, a, b, s) in ref.items():
        got = out.loc[vid]
        assert got.label == lab
        assert got.a_i == pytest.approx(f6(a), abs=2e-6)
        assert got.b_i == pytest.approx(f6(b), abs=2e-6)
        assert got.s == pytest.approx(s, abs=2e-5)
        assert got.nearest_label == nl


def test_label_coherence_reading(spark, sf_dir):
    """Silhouette is bounded in [-1, 1]; the honest audit verdict on
    this near-uniform corpus: labels are nearly geometric noise —
    mean s near 0 with BOTH signs present (that finding is what the
    audit exists to surface)."""
    out = silhouette_labels(spark, sf_dir).toPandas()
    assert out["s"].between(-1, 1).all()
    assert abs(out["s"].mean()) < 0.15
    assert (out["s"] > 0).any() and (out["s"] < 0).any()
