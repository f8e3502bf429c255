"""Matrix-profile kernel gates: blocked BLAS kernel == naive O(q^2 m)
loop (values AND tie-broken argmins), exclusion-zone semantics, short-
series behavior, and the Spark operator's exact row parity with the
local kernel."""

from __future__ import annotations

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators import matrixprofile as MP


def naive_mp(a, m, excl):
    a = np.asarray(a, dtype=np.int64)
    q = a.size - m + 1
    if q <= excl + 1:
        return None
    d2 = np.empty(q, dtype=np.int64)
    nn = np.empty(q, dtype=np.int64)
    for i in range(q):
        best, bj = None, -1
        wi = a[i : i + m]
        for j in range(q):
            if abs(i - j) <= excl:
                continue
            d = int(((wi - a[j : j + m]) ** 2).sum())
            if best is None or d < best:  # strict < == first-occurrence tie rule
                best, bj = d, j
        d2[i] = best
        nn[i] = bj
    return d2, nn


@pytest.mark.parametrize("n,m,excl,block", [
    (40, 8, 4, 512),   # single block
    (40, 8, 4, 7),     # many ragged blocks
    (65, 5, 2, 16),    # block boundary not aligned to q
    (200, 16, 8, 64),
])
def test_kernel_matches_naive(n, m, excl, block):
    rng = np.random.default_rng(n * 1000 + m)
    # small vocab forces many exact ties -> exercises the argmin tie rule
    a = rng.integers(0, 4, size=n)
    d2, nn = MP.mp_self(a, m, excl, block=block)
    nd2, nnn = naive_mp(a, m, excl)
    assert np.array_equal(d2, nd2)
    assert np.array_equal(nn, nnn)


def test_exclusion_zone_and_short_series():
    a = np.arange(20)
    # q = 13 with m=8; excl=12 leaves no admissible neighbor pair
    assert MP.mp_self(a, 8, 12) is None
    # excl=11: only (0, 12) admissible; middle positions have NO
    # admissible neighbor -> defined sentinel, not garbage
    d2, nn = MP.mp_self(a, 8, 11)
    assert nn[0] == 12 and nn[12] == 0
    assert d2[0] == d2[12] == 8 * 12 * 12
    assert all(d2[i] == -1 and nn[i] == -1 for i in range(1, 12))
    # trivial self-match must never win: identical halves, excl big
    b = np.tile(np.arange(10), 2)
    d2b, nnb = MP.mp_self(b, 4, 5)
    assert d2b[0] == 0 and nnb[0] == 10  # exact repeat 10 apart


def test_real_token_values_exact():
    # top-of-vocab values: products ~2.5e9, sums ~2e10 — still exact
    a = np.array([50256, 0] * 30 + [50256, 50256] * 10, dtype=np.int64)
    d2, nn = MP.mp_self(a, 8, 4, block=9)
    nd2, nnn = naive_mp(a, 8, 4)
    assert np.array_equal(d2, nd2) and np.array_equal(nn, nnn)


def test_spark_operator_parity(spark):
    n_docs, maxlen, m, excl = 12, 96, 8, 4
    import pyspark.sql.functions as F

    seqs = synth.sequences_df(spark, n_docs).withColumn(
        "tokens", F.slice("tokens", 1, maxlen)
    )
    got = {
        (r.doc_id, r.pos): (r.nn_pos, r.d2)
        for r in MP.matrix_profile(seqs, m=m, excl=excl, block=17).collect()
    }
    pdf = synth.sequences_local(n_docs)
    want = {}
    for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
        d2, nn = MP.mp_self(np.asarray(toks)[:maxlen], m, excl)
        for i in range(d2.size):
            want[(doc_id, i)] = (nn[i], d2[i])
    assert got == want


def test_zero_shuffle_plan(spark):
    seqs = synth.sequences_df(spark, 8)
    plan = MP.matrix_profile(seqs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ab_join_matches_naive_and_plants(spark):
    """AB kernel == naive double loop (with the (d2, q_doc, q_pos) tie
    rule), and a planted verbatim slice surfaces as a run of d2=0 hits
    pointing at the exact source offsets."""
    import pandas as pd
    import pyspark.sql.functions as F

    m = 6
    rng = np.random.default_rng(7)
    corpus_rows = [("c%02d" % i, rng.integers(0, 5, size=40).tolist())
                   for i in range(5)]
    # plant: query 'qb' = corpus c02 positions 10..25 verbatim
    plant = corpus_rows[2][1][10:26]
    q_rows = [("qa", rng.integers(0, 5, size=14).tolist()), ("qb", plant)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id string, tokens array<int>")
    qdf = spark.createDataFrame(q_rows, "doc_id string, tokens array<int>")
    got = {
        (r.doc_id, r.pos): (r.q_doc, r.q_pos, r.d2)
        for r in __import__("dtaidistance_spark.operators.matrixprofile",
                            fromlist=["matrix_profile_ab"])
        .matrix_profile_ab(corpus, qdf, m=m, block=3).collect()
    }
    # naive oracle
    qwins = []
    for qd, toks in sorted(q_rows):
        a = np.asarray(toks)
        for j in range(a.size - m + 1):
            qwins.append((qd, j, a[j:j + m]))
    for cd, toks in corpus_rows:
        a = np.asarray(toks)
        for i in range(a.size - m + 1):
            cands = sorted(
                (int(((a[i:i + m] - w) ** 2).sum()), qd, j)
                for qd, j, w in qwins
            )
            d2, qd, j = cands[0]
            assert got[(cd, i)] == (qd, j, d2), (cd, i)
    # planted run: c02 windows 10..20 hit qb exactly
    for i in range(10, 26 - m + 1):
        qd, j, d2 = got[("c02", i)]
        assert d2 == 0 and qd == "qb" and j == i - 10


def test_ab_short_series_skipped(spark):
    corpus = spark.createDataFrame(
        [("a", [1, 2]), ("b", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])],
        "doc_id string, tokens array<int>",
    )
    qdf = spark.createDataFrame([("q", [1, 2, 3, 4, 5, 6, 7, 8])],
                                "doc_id string, tokens array<int>")
    from dtaidistance_spark.operators.matrixprofile import matrix_profile_ab

    out = matrix_profile_ab(corpus, qdf, m=8).collect()
    assert {r.doc_id for r in out} == {"b"} and len(out) == 3


def test_znorm_semantics_vs_explicit_normalization():
    """mp_self_znorm == squared Euclidean between explicitly z-normed
    windows (semantic check, 1e-9 tol), and identical windows hit
    exactly 0 thanks to the clip."""
    rng = np.random.default_rng(42)
    a = np.concatenate([
        rng.integers(0, 50, size=40),
        rng.integers(0, 50, size=10) * 3 + 7,  # scaled/offset repeats
    ])
    m, excl = 8, 4
    d2, nn = MP.mp_self_znorm(a, m, excl, block=13)
    q = a.size - m + 1
    Wf = np.lib.stride_tricks.sliding_window_view(a, m).astype(float)

    def znorm(w):
        sd = w.std()
        return np.zeros_like(w) if sd == 0 else (w - w.mean()) / sd

    for i in range(q):
        best = None
        for j in range(q):
            if abs(i - j) <= excl:
                continue
            d = float(((znorm(Wf[i]) - znorm(Wf[j])) ** 2).sum())
            best = d if best is None else min(best, d)
        assert abs(d2[i] - best) < 1e-9, (i, d2[i], best)
    # plant an exact scaled+offset copy: mathematically corr = 1, but
    # sqrt(25*v) != 5*sqrt(v) by an ulp, so d2 lands within a few ulps
    # of 0 rather than exactly 0 (identical windows DO clip to exactly
    # 0: num == va is integer-exact there) — both engines agree on the
    # tiny residual, which is what the oracle hash proves
    b = np.concatenate([a[:20], a[:12] * 5 + 100])
    db, nb = MP.mp_self_znorm(b, m, excl)
    assert db[20] < 1e-12 and nb[20] == 0
    assert (db >= 0).all()


def test_znorm_degenerate_windows():
    # constant vs constant -> 0; constant vs varying -> 2*m
    a = np.array([7] * 12 + [1, 9, 2, 8, 3, 7, 4, 6] * 2)
    m, excl = 4, 1
    d2, nn = MP.mp_self_znorm(a, m, excl)
    assert d2[0] == 0.0 and nn[0] == 2  # first admissible constant window
    # a window overlapping the constant/varying boundary still behaves
    assert np.isfinite(d2).all()


def test_znorm_spark_parity(spark):
    import pyspark.sql.functions as F

    seqs = synth.sequences_df(spark, 6).withColumn(
        "tokens", F.slice("tokens", 1, 64)
    )
    got = {
        (r.doc_id, r.pos): (r.nn_pos, r.d2)
        for r in MP.matrix_profile_znorm(seqs, m=8, excl=4, block=9).collect()
    }
    pdf = synth.sequences_local(6)
    for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
        d2, nn = MP.mp_self_znorm(np.asarray(toks)[:64], 8, 4)
        for i in range(d2.size):
            assert got[(doc_id, i)] == (nn[i], d2[i])


# ---------------------------------------------------------------------------
# MP7 — FLUSS
# ---------------------------------------------------------------------------


def test_fluss_cac_matches_naive_arc_count():
    import numpy as np

    from dtaidistance_spark.operators.matrixprofile import fluss_cac, mp_self

    rng = np.random.default_rng(3)
    a = np.concatenate(
        [rng.integers(0, 50, 140), rng.integers(1000, 1050, 140)]
    )
    m, excl, zone = 8, 4, 40
    ac, cac = fluss_cac(a, m, excl, zone)
    d2, nn = mp_self(a.astype(np.int64), m, excl)
    q = d2.size
    for i in range(0, q, 17):  # naive O(q^2) spot grid
        want = sum(
            1
            for p in range(q)
            if nn[p] >= 0 and min(p, nn[p]) < i < max(p, nn[p])
        )
        assert ac[i] == want, i
    # the regime change at 140 must be the interior CAC minimum
    interior = np.arange(q)[(np.arange(q) >= zone) & (np.arange(q) <= q - 1 - zone)]
    best = interior[np.argmin(cac[interior])]
    assert abs(best - (140 - m)) <= 2 * m
    assert cac.min() >= 0.0 and cac.max() <= 1.0
    assert (cac[:zone] == 1.0).all() and (cac[-zone:] == 1.0).all()


def test_fluss_regimes_recover_planted_splice(spark, sf_dir):
    from dtaidistance_spark.operators.motif_q import fluss_regimes

    out = fluss_regimes(spark, sf_dir).toPandas()
    assert len(out) >= 25
    # every spliced pair's CAC argmin lands in the straddling-window
    # region of the planted generator change (128 ± 2m)
    assert out["near_splice"].all()
    assert (out["cac_min"] < 0.25).all()
