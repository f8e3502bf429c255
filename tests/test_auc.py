"""Semantic gates for auc_q (T87): sklearn-free rank-based AUC
recompute from raw parquet, the midrank/U identity on a tied hand
example, the antisymmetry and all-ties closed cases, a planted
separating score, and the honest no-signal two-scale reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.auc_q import auc_length_source

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _auc_ref(scores, labels):
    """Midrank-based AUC + tie-corrected MWU z — the classic ranks
    route, independent of the query's fold."""
    s = np.asarray(scores, dtype=np.float64)
    y = np.asarray(labels)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    i = 0
    ss = s[order]
    tiesum = 0
    while i < len(s):
        j = i
        while j < len(s) and ss[j] == ss[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        t = j - i
        tiesum += t**3 - t
        i = j
    n1 = int(y.sum())
    n2 = len(y) - n1
    r1 = ranks[y == 1].sum()
    u = r1 - n1 * (n1 + 1) / 2.0
    auc = u / (n1 * n2)
    nt = n1 + n2
    var = n1 * n2 / 12.0 * ((nt + 1) - tiesum / (nt * (nt - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else None
    return auc, z, n1, n2


def test_matches_rank_route(spark, sf_dir):
    out = auc_length_source(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sub = raw[raw.source.isin(["src0", "src1"])]
    auc, z, n1, n2 = _auc_ref(
        sub.n_chars.to_numpy(),
        (sub.source == "src1").astype(int).to_numpy(),
    )
    assert out.n1 == n1 and out.n2 == n2
    assert abs(out.auc - f6(auc)) < 1e-6
    assert abs(out.gini - f6(2 * auc - 1)) < 2e-6
    assert abs(out.z_mwu - f6(z)) < 1e-5


def test_tied_hand_example():
    # scores [1,2,2,3], labels [0,0,1,1]: midranks [1,2.5,2.5,4],
    # U = 6.5 − 3 = 3.5, AUC = 3.5/4 = 0.875
    auc, z, _, _ = _auc_ref([1, 2, 2, 3], [0, 0, 1, 1])
    assert abs(auc - 0.875) < 1e-12


def test_antisymmetry_and_all_ties():
    rng = np.random.RandomState(3)
    s = rng.randint(0, 50, 200)
    y = rng.randint(0, 2, 200)
    a1, _, _, _ = _auc_ref(s, y)
    a2, _, _, _ = _auc_ref(-s, y)
    assert abs(a1 + a2 - 1.0) < 1e-12
    # every score identical: AUC = ½ exactly, variance degenerates
    a3, z3, _, _ = _auc_ref(np.ones(50), y[:50])
    assert a3 == 0.5 and (z3 is None or abs(z3) < 1e-12)


def test_planted_perfect_separation():
    s = np.concatenate([np.arange(50), 100 + np.arange(50)])
    y = np.concatenate([np.zeros(50, int), np.ones(50, int)])
    auc, z, _, _ = _auc_ref(s, y)
    assert auc == 1.0 and z > 8  # z = √(12·n1·n2/(N+1))/2 ≈ 8.6 here


def test_honest_no_signal_two_scales(spark):
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        out = auc_length_source(spark, sf).toPandas().iloc[0]
        assert out.n1 == 25 and out.n2 == 25
        assert 0.35 < out.auc < 0.65
        assert out.reject_no_signal == 0
