"""Gates for the selection-side pipeline operators (sampling_q):
decontamination, hash sampling, split assignment, Bloom dedup.

The oracle equivalence itself is covered by test_oracle.py /
test_driver_harness.py (the modules register on import); these tests
pin the *semantics* the oracles can't see — no-false-negative behavior
on injected duplicates, determinism across runs, Python recomputation
of the contamination rule.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dtaidistance_spark.operators import sampling_q as SQ
from dtaidistance_spark.operators.queries import REGISTRY, T


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_matches_python_recompute(spark, sf_dir):
    """Re-derive the per-doc distinct 4-gram hit counts in plain Python
    and require an exact match, row for row."""
    docs = {
        r.doc_id: (r.text or "").lower().split(" ")
        for r in T(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    n = SQ._DECON_N

    def grams(ws):
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    eval_grams = set()
    for did, ws in docs.items():
        if did % 37 == 0:
            eval_grams |= grams(ws)

    got = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contaminated)
        for r in REGISTRY["decontaminate"](spark, sf_dir).collect()
    }
    assert set(got) == {d for d in docs if d % 37 != 0}
    for did, ws in docs.items():
        if did % 37 == 0:
            continue
        hits = len(grams(ws) & eval_grams)
        assert got[did] == (max(len(ws) - n + 1, 0), hits, hits > 0), did


def test_decontaminate_excludes_eval_slice(spark, sf_dir):
    df = REGISTRY["decontaminate"](spark, sf_dir)
    assert df.where(F.col("doc_id") % 37 == 0).count() == 0


# ---------------------------------------------------------------------------
# domain_mixing_sample / train_split_assign
# ---------------------------------------------------------------------------


def test_domain_mixing_rates_and_determinism(spark, sf_dir):
    rows = REGISTRY["domain_mixing_sample"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = 2500 if int(r.source[3:]) % 2 == 0 else 7500
        assert r.rate_bp == want, r
        assert 0 <= r.n_kept <= r.n_docs
        assert abs(r.achieved_rate - round(r.n_kept / r.n_docs, 4)) < 1e-9
    again = REGISTRY["domain_mixing_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_train_split_partitions_corpus(spark, sf_dir):
    total = T(spark, sf_dir, "documents").count()
    rows = REGISTRY["train_split_assign"](spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in rows) == total
    frac = sum(r.n_docs for r in rows if r.split == "train") / total
    assert 0.80 <= frac <= 0.98  # 90% nominal, small-N slack


# ---------------------------------------------------------------------------
# bloom dedup kernel — injected duplicates (the synthetic corpus has
# none at test SF, so the no-false-negative path needs its own data)
# ---------------------------------------------------------------------------


@pytest.fixture()
def toy_docs(spark):
    rows = [
        # (doc_id, text, source): src0-9 = historical, src10+ = new
        (0, "alpha beta gamma", "src0"),
        (1, "delta epsilon zeta", "src1"),
        (2, "eta theta iota", "src2"),
        (10, "alpha beta gamma", "src10"),  # exact dup of doc 0
        (11, "completely novel content", "src11"),
        (12, "delta epsilon zeta", "src12"),  # exact dup of doc 1
    ]
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_bloom_no_false_negatives_on_injected_dups(spark, toy_docs, tmp_path):
    p = str(tmp_path / "documents.parquet")
    toy_docs.write.mode("overwrite").parquet(p)
    row = REGISTRY["bloom_dedup_check"](spark, str(tmp_path)).collect()[0]
    assert row.n_hist == 3 and row.n_new == 3
    assert row.hist_all_flagged  # Bloom guarantees no false negatives
    assert row.n_new_exact_dup == 2
    # both dups MUST be flagged; the novel doc may only FP
    assert 2 <= row.n_new_flagged <= 3


def test_bloom_bitmap_matches_python_twin(spark, toy_docs, tmp_path):
    """The tree-aggregated Spark build equals a single-process numpy
    build of the same double-hashing scheme."""
    p = str(tmp_path / "documents.parquet")
    toy_docs.repartition(3).write.mode("overwrite").parquet(p)
    h = SQ._bloom_hashes(spark.read.parquet(p))
    bits = SQ._bloom_build(h.where(F.col("src_num") < 10))

    want = np.zeros(SQ._BLOOM_M, dtype=bool)
    for r in toy_docs.where(F.substring("source", 4, 8).cast("int") < 10).collect():
        hx = hashlib.md5(r.text.encode()).hexdigest()
        h1, h2 = int(hx[:8], 16), int(hx[8:16], 16) | 1
        for i in range(SQ._BLOOM_K):
            want[(h1 + i * h2) % SQ._BLOOM_M] = True
    assert (bits == want).all()


def test_training_order_mix_interleaves_proportionally(spark, sf_dir):
    """T51: ranks and mix keys recompute from hashlib; every prefix of
    the emitted order holds each source within ±2 of its share."""
    import hashlib

    import pandas as pd

    from dtaidistance_spark.operators.sampling_q import training_order_mix

    out = training_order_mix(spark, sf_dir).toPandas()
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    docs["hkey"] = [
        int(hashlib.md5(f"mix|{d}".encode()).hexdigest()[:15], 16)
        for d in docs.doc_id
    ]
    N = len(docs)
    want = {}
    for src, grp in docs.groupby("source"):
        g = grp.sort_values(["hkey", "doc_id"]).reset_index()
        n_s = len(g)
        for r, row in enumerate(g.itertuples(), start=1):
            want[row.doc_id] = (src, r, n_s, (2 * r - 1) * N // (2 * n_s))
    got = out.set_index("doc_id")
    assert len(got) == N
    for doc_id, (src, r, n_s, key) in want.items():
        row = got.loc[doc_id]
        assert (row.source, row.rank_in_source, row.n_s, row.mix_key) == (
            src, r, n_s, key,
        ), doc_id
    # the interleave guarantee: in ANY prefix of the consumption order,
    # each source's count stays within ±2 of proportional
    ordered = out.sort_values(
        ["mix_key", "source", "rank_in_source"]
    ).reset_index()
    counts = {s: 0 for s in out.source.unique()}
    shares = out.groupby("source").size() / N
    for p, row in enumerate(ordered.itertuples(), start=1):
        counts[row.source] += 1
        for s, c in counts.items():
            assert abs(c - p * shares[s]) <= 2, (p, s)


# ---------------------------------------------------------------------------
# T52 — weighted reservoir sample (A-Res)
# ---------------------------------------------------------------------------


def _ares_keys(loc, salt="ares|"):
    import hashlib
    import math

    keys = {}
    for row in loc.itertuples():
        h = int(hashlib.md5((salt + row.doc_id).encode()).hexdigest()[:13], 16)
        u = (h + 1) / 4503599627370496.0
        keys[row.doc_id] = -math.log(u) / float(row.n_tok)
    return keys


def test_weighted_reservoir_matches_recompute(spark, sf_dir):
    import math

    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.sampling_q import (
        _RES_K,
        _RES_N,
        weighted_reservoir_sample,
    )

    loc = synth.sequences_local(_RES_N)
    keys = _ares_keys(loc)
    want = sorted(keys, key=lambda d: (keys[d], d))[:_RES_K]
    out = (
        weighted_reservoir_sample(spark, sf_dir)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == want
    for _, r in out.iterrows():
        assert r["key6"] == pytest.approx(
            math.floor(keys[r["doc_id"]] * 1e6 + 0.5) / 1e6, abs=2e-6
        )


def test_weighted_reservoir_is_weight_proportional(spark, sf_dir):
    """Formula-level distributional gate: across 64 salted replicas of
    the SAME A-Res draw, the top-weight quartile of docs must be
    included far more often than the bottom quartile (inclusion prob
    rises with w), and every replica is a valid no-replacement sample."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.sampling_q import _RES_K, _RES_N

    loc = synth.sequences_local(_RES_N)
    w = {row.doc_id: int(row.n_tok) for row in loc.itertuples()}
    order = sorted(w, key=lambda d: w[d])
    q = len(order) // 4
    lo, hi = set(order[:q]), set(order[-q:])
    lo_hits = hi_hits = 0
    for r in range(64):
        keys = _ares_keys(loc, salt=f"ares{r}|")
        samp = sorted(keys, key=lambda d: (keys[d], d))[:_RES_K]
        assert len(set(samp)) == _RES_K  # without replacement
        lo_hits += len(lo & set(samp))
        hi_hits += len(hi & set(samp))
    assert hi_hits > 2 * lo_hits
