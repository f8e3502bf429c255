"""Semantic gates for kcenter_q (T64): exact numpy replay of the
greedy traversal + the Gonzalez structural guarantees."""

import math

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.operators.kcenter_q import _K, kcenter_coreset

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def ref(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(d.embedding.values).astype(np.float64)
    ids = d.vec_id.to_numpy()
    picks = [(1, int(ids[0]), None)]
    mind2 = ((V - V[0]) ** 2).sum(1)
    for j in range(2, _K + 1):
        # argmax with (mind2 DESC, vec_id ASC) ties
        best = max(range(len(ids)), key=lambda i: (mind2[i], -ids[i]))
        picks.append((j, int(ids[best]), float(mind2[best])))
        mind2 = np.minimum(mind2, ((V - V[best]) ** 2).sum(1))
    return picks, float(mind2.max())


def test_greedy_replay_matches(spark, sf_dir, ref):
    picks, final_cover = ref
    out = kcenter_coreset(spark, sf_dir).toPandas().set_index("sel_idx")
    assert len(out) == _K
    for j, vid, r2 in picks:
        got = out.loc[j]
        assert got.vec_id == vid, j
        if r2 is None:
            assert pd.isna(got.radius2)
        else:
            assert got.radius2 == pytest.approx(f6(r2), abs=2e-6), j


def test_gonzalez_structure(spark, sf_dir, ref):
    """The coverage radius sequence is non-increasing (each pick is
    the farthest point, so the next farthest can only be closer), the
    picks are distinct, and the selection genuinely spreads: the final
    max-min distance is below the first radius."""
    picks, final_cover = ref
    out = kcenter_coreset(spark, sf_dir).toPandas().sort_values(
        "sel_idx"
    )
    rs = out["radius2"].dropna().to_numpy()
    assert (np.diff(rs) <= 1e-9).all()
    assert out["vec_id"].nunique() == _K
    assert final_cover <= rs[0]
