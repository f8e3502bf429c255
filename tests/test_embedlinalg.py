"""Gates for embedlinalg_q: the BLAS sufficient-statistics reduce must
equal the ORACLED relational gram on the same round(6) grid, and the
power-iteration component must match numpy's full eigensolve."""

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.operators.embedlinalg_q import (
    _D,
    _power_component,
    _suffstats_df,
    embed_gram_check,
    pca_power_topcomp,
)


@pytest.fixture(scope="module")
def X(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return np.stack(emb.embedding.to_numpy()).astype(np.float64), emb


def test_suffstats_equal_oracled_gram(spark, sf_dir):
    row = _suffstats_df(spark, sf_dir).first()
    stats = np.array(row["stats"])
    gram = embed_gram_check(spark, sf_dir).toPandas()
    n = int(row["n"])
    assert (gram.n == n).all()
    s2 = stats[_D:].reshape(_D, _D)
    for r in gram.itertuples():
        want = stats[r.i] if r.j == -1 else s2[r.i, r.j]
        assert round(want, 6) == pytest.approx(r.s, abs=2e-6), (r.i, r.j)


def test_power_component_matches_eigh(spark, sf_dir, X):
    M, _ = X
    row = _suffstats_df(spark, sf_dir).first()
    mean, cov, v, lam = _power_component(row["n"], row["stats"])
    assert np.allclose(mean, M.mean(0), atol=1e-9)
    assert np.allclose(cov, np.cov(M.T, bias=True), atol=1e-9)
    w, V = np.linalg.eigh(cov)
    top = V[:, -1]
    assert abs(float(np.dot(v, top))) > 0.9999
    assert lam == pytest.approx(w[-1], rel=1e-6)


def test_pca_scores_and_energy(spark, sf_dir, X):
    M, emb = X
    out = pca_power_topcomp(spark, sf_dir).toPandas().set_index("vec_id")
    row = _suffstats_df(spark, sf_dir).first()
    mean, cov, v, lam = _power_component(row["n"], row["stats"])
    C = M - mean
    scores = C @ v
    res = (C * C).sum(1) - scores**2
    for k, vid in enumerate(emb.vec_id):
        got = out.loc[vid]
        assert got.pc1_score == pytest.approx(scores[k], abs=1e-5)
        assert got.residual_energy == pytest.approx(res[k], abs=1e-5)
        assert got.residual_energy >= -1e-6
    # the top component explains a plausible share, and exactly lam/trace
    assert out.explained_ratio.nunique() == 1
    assert out.explained_ratio.iloc[0] == pytest.approx(
        lam / np.trace(cov), abs=1e-6
    )
    # variance decomposition: mean residual + var(scores) == total var
    assert (res.mean() + scores.var()) == pytest.approx(
        np.trace(cov) * 1.0, rel=1e-6
    )


def test_mahalanobis_matches_numpy(spark, sf_dir, X):
    """E6: maha² recompute via numpy's solve on the exact covariance;
    the whitener route and the solve route must agree."""
    from dtaidistance_spark.operators.embedlinalg_q import (
        _EPS,
        embed_mahalanobis,
    )

    M, emb = X
    out = embed_mahalanobis(spark, sf_dir).toPandas().set_index("vec_id")
    mean = M.mean(0)
    cov = np.cov(M.T, bias=True) + _EPS * np.eye(_D)
    inv = np.linalg.inv(cov)
    C = M - mean
    want = np.round((C @ inv * C).sum(1), 6)
    got = out.loc[emb.vec_id].maha2.to_numpy()
    assert np.allclose(got, want, atol=2e-6)
    assert (out.loc[emb.vec_id].label.to_numpy() == emb.label.to_numpy()).all()
    thr = 64.0 + 4.0 * (2.0 * 64.0) ** 0.5
    assert (out.is_outlier == (out.maha2 > thr)).all()
    # maha² under the true model averages ~d
    assert 40 < out.maha2.mean() < 90


def test_whiten_identity_check_is_tight(spark, sf_dir):
    """E6-check: whitened covariance == identity to fp precision."""
    from dtaidistance_spark.operators.embedlinalg_q import (
        embed_whiten_identity_check,
    )

    row = embed_whiten_identity_check(spark, sf_dir).toPandas().iloc[0]
    assert row.n == 500
    assert row.max_diag_dev < 1e-6
    assert row.max_offdiag_dev < 1e-6
    assert row.max_mean_dev < 1e-9


# ---------------------------------------------------------------------------
# E7 — int8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq8_stats_and_sse_match_numpy(spark, sf_dir, X):
    from dtaidistance_spark.operators.ann_q import embed_sq8_check

    out = embed_sq8_check(spark, sf_dir).toPandas().set_index("i").sort_index()
    X = X[0]
    mn, mx = X.min(axis=0), X.max(axis=0)
    q = np.floor((X - mn) * 255.0 / (mx - mn) + 0.5)
    xr = mn + q * (mx - mn) / 255.0
    sse = ((X - xr) ** 2).sum(axis=0)
    assert len(out) == X.shape[1]
    assert np.allclose(out["mn"].to_numpy(), mn, atol=0)
    assert np.allclose(out["mx"].to_numpy(), mx, atol=0)
    assert np.allclose(out["sse"].to_numpy(), sse, atol=2e-6)
    assert (out["q_lo"] >= 0).all() and (out["q_hi"] <= 255).all()
    assert (out["q_lo"] == 0).all() and (out["q_hi"] == 255).all()
    # quantization grain: per-dim MSE must sit below (step^2)/4, i.e.
    # every value lands within half a quantization step
    step = (mx - mn) / 255.0
    assert (out["sse"].to_numpy() / X.shape[0] <= step**2 / 4 + 1e-12).all()


def test_sq8_recall_meets_floor(spark, sf_dir):
    from dtaidistance_spark.operators.ann_q import embed_sq8_recall_check

    row = embed_sq8_recall_check(spark, sf_dir).toPandas().iloc[0]
    assert bool(row["met"]), row["recall_at_k"]
    assert row["recall_at_k"] >= 0.9


def test_lsh_multiprobe_beats_singleprobe_at_same_table_budget(spark, sf_dir):
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators import ann as A

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 8)
    exact = A.brute_cosine_topk(emb, qs, k=10)
    mp = A.lsh_multiprobe_topk(
        emb, qs, dim=64, k=10, n_tables=4, n_planes=4, n_flip=3
    )
    sp = A.lsh_cosine_topk(emb, qs, dim=64, k=10, n_tables=4, n_planes=4)
    r_mp = A.recall_at_k(mp, exact, k=10).collect()[0][0]
    r_sp = A.recall_at_k(sp, exact, k=10).collect()[0][0]
    assert r_mp >= 0.8
    assert r_mp > r_sp + 0.2  # the probe sequence, not the planes, lifts it


def test_jl_distortion_matches_numpy_and_concentrates(spark, sf_dir, X):
    import hashlib

    from dtaidistance_spark.operators.embedlinalg_q import (
        _JD,
        _JNS,
        jl_project_distortion,
    )

    M = X[0][:_JNS]
    R = np.zeros((64, _JD))
    for i in range(64):
        for j in range(_JD):
            h = int(
                hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[:8], 16
            ) % 6
            R[i, j] = 1.0 if h == 0 else (-1.0 if h == 1 else 0.0)
    Y = M @ R
    out = jl_project_distortion(spark, sf_dir).toPandas()
    assert len(out) == _JNS * (_JNS - 1) // 2
    idx = out.set_index(["id_a", "id_b"])
    rng = np.random.default_rng(0)
    for a, b in rng.integers(0, _JNS, size=(40, 2)):
        if a >= b:
            continue
        row = idx.loc[(a, b)]
        d2o = ((M[a] - M[b]) ** 2).sum()
        d2p = ((Y[a] - Y[b]) ** 2).sum() * 3.0 / _JD
        assert row.d2_orig == pytest.approx(d2o, abs=2e-5)
        assert row.d2_proj == pytest.approx(d2p, abs=2e-5)
        assert row.ratio == pytest.approx(d2p / d2o, abs=1e-4)
    # JL concentration: unbiased on average, mostly inside the band
    assert 0.9 < out.ratio.mean() < 1.1
    assert out.within_jl_band.mean() > 0.9
