"""A1-scale gates — salted giant-group DBA rollup
(operators/rollup.py::dba_rollup_salted + kernels.dba_batch_weighted;
round-4 verdict item #4).  The contract, in order of strength:

1. balanced groups take the exact tier's code path: output
   ARRAY-BIT-EQUAL to dba_rollup when nothing crosses the threshold;
2. a salted group of identical members returns that member to the ulp
   (the rollup_diag_identity law survives salting; the registry twin
   rollup_salted_identity oracles the rounded form);
3. the adversarial heterogeneous control (64 maximally different
   synth series forced through 4 salt buckets) stays inside the
   DECLARED approximation: measured max |salted − exact| = 2 977 on
   the 50 257 token scale (5.9 %), pinned ≤ 4 000, with counts exact
   either way — and the kernel-level control shows WHY the weighted
   DTW-aligned merge is the right rule (naive unaligned mean of the
   same partials: 10 310 = 3.5× worse);
4. weighted-kernel laws: weights=1 is bit-identical to the unweighted
   batch kernel; weight 2 equals physically duplicating the member as
   a REAL number but differs in the last ulp as a float (repeated
   adds round per add, the weighted form per node: fl(s+x+x) ≠
   fl(s+2x) — measured 7.3e-12, gated ≤ 1e-9);
5. the salted path is deterministic across runs (no RNG — the salt is
   xxhash64 of the member id).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dtaidistance_spark import kernels as K, synth
from dtaidistance_spark.operators import rollup as R


def _rows_map(rows):
    return {
        (r["key"], r["window_start"]): (
            r["n_series"],
            r["n_points"],
            np.array(r["barycenter"]),
        )
        for r in rows
    }


def _hot_group_df(spark, n=64):
    return synth.sequences_df(spark, n).select(
        "doc_id",
        "tokens",
        F.lit("hot").alias("source"),
        F.to_timestamp(F.lit("2025-01-01 00:00:30")).alias("ts"),
    )


def test_balanced_groups_bit_equal(spark):
    """Gate 1: with the threshold above every group size the salted
    operator routes everything down the exact tier — bit-equal."""
    df = synth.sequences_df(spark, 48)
    exact = _rows_map(R.dba_rollup(df, tier="1 minute").collect())
    salted = _rows_map(
        R.dba_rollup_salted(
            df, tier="1 minute", salt_threshold=10**9
        ).collect()
    )
    assert exact.keys() == salted.keys()
    for k in exact:
        ns_e, np_e, b_e = exact[k]
        ns_s, np_s, b_s = salted[k]
        assert (ns_e, np_e) == (ns_s, np_s)
        assert (b_e == b_s).all()  # bit-equal, not approx


def test_salted_replicated_identity_ulp(spark):
    """Gate 2: 24 identical copies forced through the salted path
    return the member itself — every partial equals the series, the
    weighted merge of equal partials returns it (ulp-tight)."""
    base = synth.sequences_df(spark, 6).withColumn(
        "tokens", F.slice("tokens", 1, 64)
    )
    df = base.select(
        F.explode(F.array(*[F.lit(i) for i in range(24)])).alias("r"),
        F.col("doc_id").alias("orig"),
        "tokens",
        "ts",
    ).select(
        F.concat("orig", F.lit("#"), F.col("r").cast("string")).alias(
            "doc_id"
        ),
        "tokens",
        F.col("orig").alias("source"),
        "ts",
    )
    out = R.dba_rollup_salted(
        df,
        tier="1 minute",
        barycenter_len=64,
        dba_window=4,
        salt_threshold=8,
        salt_buckets=4,
    ).collect()
    want = {
        r["doc_id"]: np.array(r["tokens"], dtype=np.float64)
        for r in base.collect()
    }
    assert len(out) == 6
    for r in out:
        assert r["n_series"] == 24
        assert r["n_points"] == 24 * 64
        got = np.array(r["barycenter"])
        assert np.abs(got - want[r["key"]]).max() <= 1e-9


def test_heterogeneous_delta_pinned(spark):
    """Gate 3: the adversarial control — 64 maximally heterogeneous
    series in one giant group, 4 salt buckets.  Counts exact, the
    barycenter delta inside the declared 8 % bound (measured 5.9 %)."""
    df = _hot_group_df(spark)
    exact = R.dba_rollup(df, tier="1 minute").collect()
    salted = R.dba_rollup_salted(
        df, tier="1 minute", salt_threshold=16, salt_buckets=4
    ).collect()
    assert len(exact) == len(salted) == 1
    assert (exact[0]["n_series"], exact[0]["n_points"]) == (
        salted[0]["n_series"],
        salted[0]["n_points"],
    ) == (64, exact[0]["n_points"])
    d = np.abs(
        np.array(exact[0]["barycenter"]) - np.array(salted[0]["barycenter"])
    )
    assert d.max() <= 4000.0  # measured 2977 — declared bound
    assert d.mean() <= 1500.0  # measured 988


def test_merge_rule_beats_naive_mean():
    """Gate 3b (kernel-level): on a 4-way partial split of the same 64
    series, the weighted DTW-aligned merge lands ~3.5× closer to the
    exact DBA than the naive per-position weighted mean — the reason
    dba_batch_weighted exists.  Pure numpy, no Spark."""
    pdf = synth.sequences_local(64)
    mats = np.stack(
        [
            K.paa(np.asarray(t, dtype=np.float64), 128)
            for t in pdf["tokens"]
        ]
    )
    exact = K.dba_batch(mats, max_it=2, window=16)
    order = np.argsort(pdf["doc_id"].to_numpy())
    parts, wts = [], []
    for q in range(4):
        sel = order[q::4]
        parts.append(K.dba_batch(mats[sel], max_it=2, window=16))
        wts.append(len(sel))
    parts = np.stack(parts)
    wts = np.asarray(wts, dtype=np.float64)
    naive = (parts * wts[:, None]).sum(0) / wts.sum()
    merged = K.dba_batch_weighted(parts, wts, max_it=2, window=16)
    d_naive = np.abs(exact - naive).max()
    d_merge = np.abs(exact - merged).max()
    assert d_merge < d_naive / 2  # measured 4379 vs 10310
    assert d_naive > 8000  # the naive rule is genuinely bad here


def test_weighted_kernel_laws():
    """Gate 4: weights=1 ≡ unweighted (bit-equal, same init); weight 2
    ≡ duplicated member to ≤ 1e-9 only (repeated adds round per add,
    the weighted form per node — fl(s+x+x) ≠ fl(s+2x) in the last
    ulp, and a path revisiting a position triggers it even for a lone
    member)."""
    pdf = synth.sequences_local(8)
    mats = np.stack(
        [K.paa(np.asarray(t, dtype=np.float64), 64) for t in pdf["tokens"]]
    )
    init = mats[len(mats) // 2]
    un = K.dba_batch(mats, center=init, max_it=3, window=8)
    w1 = K.dba_batch_weighted(
        mats, np.ones(len(mats)), center=init, max_it=3, window=8
    )
    assert (un == w1).all()
    # duplication: ulp-level reordering only (measured 7.3e-12)
    dup = np.concatenate([mats[:1], mats], axis=0)  # member 0 twice
    d_un = K.dba_batch(dup, center=init, max_it=3, window=8)
    w2 = K.dba_batch_weighted(
        mats,
        np.array([2.0] + [1.0] * (len(mats) - 1)),
        center=init,
        max_it=3,
        window=8,
    )
    assert not (d_un == w2).all()  # the hazard is real — document it
    assert np.abs(d_un - w2).max() <= 1e-9


def test_salted_deterministic_across_runs(spark):
    """Gate 5: two independent salted runs produce identical arrays
    (deterministic salt, fixed iteration counts, stable orders)."""
    df = _hot_group_df(spark, n=32)
    kw = dict(tier="1 minute", salt_threshold=8, salt_buckets=4)
    a = _rows_map(R.dba_rollup_salted(df, **kw).collect())
    b = _rows_map(R.dba_rollup_salted(df, **kw).collect())
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][0] == b[k][0] and a[k][1] == b[k][1]
        assert (a[k][2] == b[k][2]).all()
