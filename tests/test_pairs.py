"""Pairwise ops vs brute-force scalar kernels (M1/M4/M5 parity)."""

import numpy as np
import pytest

from dtaidistance_spark import kernels as K
from dtaidistance_spark import synth
from dtaidistance_spark.operators import pairs as P

N = 80


@pytest.fixture(scope="module")
def small(spark):
    pdf = synth.sequences_local(N)
    # PAA everything to 64 points so brute force is fast and lengths equal
    pdf["tokens"] = pdf["tokens"].map(lambda t: K.paa(np.asarray(t, float), 64))
    df = spark.createDataFrame(pdf[["doc_id", "tokens"]])
    return pdf, df


def _brute_pairs(pdf, threshold, window):
    out = {}
    ids = list(pdf["doc_id"])
    arrs = [np.asarray(t, float) for t in pdf["tokens"]]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = K.dtw_distance(arrs[i], arrs[j], window=window)
            if d <= threshold:
                out[(ids[i], ids[j])] = d
    return out


def test_dtw_pairs_matches_bruteforce(spark, small):
    pdf, df = small
    thr, win = 9000.0, 8
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in P.dtw_pairs(df, threshold=thr, window=win).collect()
    }
    want = _brute_pairs(pdf, thr, win)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert len(want) > 0  # non-vacuous


def test_dtw_knn_matches_bruteforce(spark, small):
    pdf, df = small
    q = np.asarray(pdf["tokens"].iloc[0], float)
    got = P.dtw_knn(df, [("q0", q)], k=5, window=8).collect()
    dists = sorted(
        (K.dtw_distance(np.asarray(t, float), q, window=8), d)
        for d, t in zip(pdf["doc_id"], pdf["tokens"])
    )
    want_ids = [d for _, d in dists[:5]]
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == want_ids
    assert got[0]["dist"] == pytest.approx(0.0, abs=1e-9)  # query is member 0


def test_dtw_knn_ragged_matches_brute_argsort(spark):
    """LB-cascade + chunked running-kth knn == brute argsort on RAGGED
    lengths (no PAA): the pruning path (LB_Kim, padded LB_Keogh, batch
    early abandon, partition-local top-k) must change nothing."""
    pdf = synth.sequences_local(60)
    arrs = [np.asarray(t, float)[: 50 + (i * 37) % 200] for i, t in enumerate(pdf["tokens"])]
    ids = [f"d{i:03d}" for i in range(len(arrs))]
    df = spark.createDataFrame(
        [(i, [float(x) for x in a]) for i, a in zip(ids, arrs)],
        "doc_id string, tokens array<double>",
    ).repartition(7)  # several partitions: exercises local top-k + merge
    queries = [("qa", arrs[3]), ("qb", arrs[31][10:120])]
    got = P.dtw_knn(df, queries, k=7, window=16).collect()
    for qid, q in queries:
        want = sorted(
            (K.dtw_distance(a, q, window=16), i) for i, a in zip(ids, arrs)
        )[:7]
        mine = sorted(
            ((r["dist"], r["doc_id"]) for r in got if r["query_id"] == qid)
        )
        assert [i for _, i in mine] == [i for _, i in want]
        for (dg, _), (dw, _) in zip(mine, want):
            assert dg == pytest.approx(dw, abs=1e-9)


def test_subsequence_alignment_finds_embedded_query(spark):
    rng = np.random.default_rng(9)
    q = np.sin(np.linspace(0, 3, 25)) * 10
    rows = []
    for i in range(12):
        noise = rng.normal(0, 0.1, size=100)
        s = noise.copy()
        pos = 10 + i * 3
        s[pos : pos + 25] += q
        rows.append((f"d{i:02d}", s.tolist(), pos))
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "doc_id string, tokens array<double>"
    )
    res = {r["doc_id"]: r for r in P.subsequence_search(df, q).collect()}
    assert len(res) == 12
    for did, _, pos in rows:
        r = res[did]
        assert abs(r["start"] - pos) <= 3, (did, r["start"], pos)
        assert abs(r["end"] - (pos + 24)) <= 3
        assert r["value"] < K.ed_distance(q, np.zeros(25)) * 0.5


def test_subsequence_topk_order(spark):
    q = np.array([0.0, 1, 2, 3, 2, 1, 0])
    rows = [
        ("exact", np.concatenate([np.zeros(5), q, np.zeros(5)]).tolist()),
        ("noisy", np.concatenate([np.zeros(5), q + 0.5, np.zeros(5)]).tolist()),
        ("none", np.full(17, 9.0).tolist()),
    ]
    df = rows_df = None
    spark_df = spark.createDataFrame(rows, "doc_id string, tokens array<double>")
    out = P.subsequence_search(spark_df, q, k=2).collect()
    assert [r["doc_id"] for r in out] == ["exact", "noisy"]
    assert out[0]["value"] == pytest.approx(0.0, abs=1e-9)


def test_exhaustive_mode_all_pairs(spark):
    """max_length_diff=None = the reference's unbounded distance_matrix:
    every pair is a candidate via the salted exhaustive join."""
    import numpy as np

    from dtaidistance_spark import synth
    from dtaidistance_spark.compat import dtw as cdtw
    from dtaidistance_spark import kernels as K

    pdf = synth.sequences_local(40)
    df = spark.createDataFrame(pdf[["doc_id", "tokens"]])
    out = cdtw.distance_matrix(df, window=4).collect()
    assert len(out) == 40 * 39 // 2
    arrs = {r.doc_id: np.asarray(r.tokens, dtype=np.float64) for r in pdf.itertuples()}
    for r in out[:5]:
        want = K.dtw_distance(arrs[r.id_a], arrs[r.id_b], window=4)
        assert abs(r.dist - want) < 1e-9


def test_pairs_penalty_maxstep_psi(spark):
    """dtw_pairs with the full K1 parameter surface equals the scalar
    kernel pair-by-pair (psi disables the LB prefilters — admissibility
    note in the operator docstring)."""
    import numpy as np

    from dtaidistance_spark import synth, kernels as K
    from dtaidistance_spark.operators import pairs as P

    pdf = synth.sequences_local(30)
    pdf["tokens"] = pdf["tokens"].map(
        lambda t: K.paa(np.asarray(t, dtype=np.float64), 32)
    )
    df = spark.createDataFrame(pdf[["doc_id", "tokens"]])
    arrs = {r.doc_id: np.asarray(r.tokens, dtype=np.float64) for r in pdf.itertuples()}
    for kw in (
        dict(penalty=50.0, max_step=5000.0),
        dict(psi=2),
        dict(psi=(1, 1, 2, 2), penalty=10.0),
    ):
        got = {
            (r.id_a, r.id_b): r.dist
            for r in P.dtw_pairs(df, threshold=6000.0, window=6, **kw).collect()
        }
        ids = sorted(arrs)
        want = {}
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                d = K.dtw_distance(arrs[x], arrs[y], window=6, **kw)
                if d <= 6000.0:
                    want[(x, y)] = d
        assert set(got) == set(want), kw
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9 * max(1.0, want[k]), (k, kw)


def test_pairs_degenerate_rows_filtered(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "tokens": [[1.0, 2, 3], [], None, [1.0, 2, 3]],
        }
    )
    df = spark.createDataFrame(pdf)
    # exhaustive psi path (LB prefilters off) must not crash on the
    # empty/null rows and must still find the identical pair
    out = P.dtw_pairs(df, threshold=1.0, window=2, psi=1).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in out] == [("a", "d", 0.0)]


def test_dtw_knn_partitions_smaller_than_k(spark):
    """Partition-local top-k must stay exact when partitions hold fewer
    than k rows (the running-kth never engages; every row is emitted
    and the global rank resolves it)."""
    pdf = synth.sequences_local(20)
    arrs = [K.paa(np.asarray(t, float), 32) for t in pdf["tokens"]]
    ids = [f"d{i:02d}" for i in range(len(arrs))]
    df = spark.createDataFrame(
        [(i, [float(x) for x in a]) for i, a in zip(ids, arrs)],
        "doc_id string, tokens array<double>",
    ).repartition(15)  # most partitions hold 1-2 rows << k
    q = arrs[5]
    got = P.dtw_knn(df, [("q", q)], k=7, window=8).collect()
    want = sorted((K.dtw_distance(a, q, window=8), i) for i, a in zip(ids, arrs))[:7]
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [i for _, i in want]


def test_exhaustive_guard_raises_past_cap(spark, small):
    _, df = small
    with pytest.raises(ValueError, match="all-pairs"):
        P.dtw_pairs(
            df, threshold=1e9, window=8, exhaustive_max_series=N - 1
        ).collect()


def test_exhaustive_past_broadcast_cap_plans_shuffle_join(spark, small):
    """Above broadcast_max_series the salted exhaustive join must NOT
    build a BroadcastExchange over the S×-exploded corpus (driver-OOM
    shape at scale); it pins a shuffle hash join keyed on the salt
    bucket. Same pair set either way (checked vs the default plan)."""
    pdf, df = small
    feats = P.with_series_features(df)
    cand = P.candidate_pairs(feats, broadcast_max_series=N // 2,
                             exhaustive_max_series=None)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
    got = {
        (r["id_a"], r["id_b"])
        for r in P.dtw_pairs(
            df, threshold=9000.0, window=8, broadcast_max_series=N // 2
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in P.dtw_pairs(df, threshold=9000.0, window=8).collect()
    }
    assert got == want and len(got) > 0
