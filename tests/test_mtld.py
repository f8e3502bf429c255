"""Semantic gates for mtld_q (T85): an independently written
recompute of every emitted number, the all-same-word closed form,
cycling-vocabulary monotonicity, palindrome direction symmetry, and
the live length-robustness contrast with TTR on the same docs."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.mtld_q import (
    _MIN_WORDS,
    _TTR,
    mtld_diversity,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _factors_ref(words):
    """Independent route: explicit segment-replay — for each position
    track the segment start, recompute the segment TTR from a dict
    (not a running counter), close on decay."""
    factors, start = 0.0, 0
    seen = {}
    for i, w in enumerate(words):
        seen[w] = seen.get(w, 0) + 1
        seg_len = i - start + 1
        seg_types = len(seen)
        if seg_types / seg_len < _TTR:
            factors += 1.0
            start = i + 1
            seen = {}
    if seen:
        seg_len = len(words) - start
        ttr = len(seen) / seg_len
        factors += (1.0 - ttr) / (1.0 - _TTR)
    return factors


def _mtld_ref(words):
    if len(words) < _MIN_WORDS:
        return None
    ff, fb = _factors_ref(words), _factors_ref(words[::-1])
    if ff < 0.999 or fb < 0.999:
        return None
    n = len(words)
    return n / ff, n / fb, (n / ff + n / fb) / 2


def test_matches_independent_replay(spark, sf_dir):
    out = mtld_diversity(spark, sf_dir).toPandas().set_index("doc_id")
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, r in raw.iterrows():
        words = r.text.lower().split(" ")
        ref = _mtld_ref(words)
        row = out.loc[r.doc_id]
        assert row.n_words == len(words)
        if ref is None:
            assert pd.isna(row.mtld)
        else:
            assert abs(row.mtld_fwd - f6(ref[0])) < 1e-6
            assert abs(row.mtld_bwd - f6(ref[1])) < 1e-6
            assert abs(row.mtld - f6(ref[2])) < 1e-6


def test_all_same_word_closed_form():
    # "w w w … w" (N words): each factor closes at its 2nd token
    # (TTR = 1/2 < 0.72), so N even ⇒ factors = N/2 ⇒ MTLD = 2
    ref = _mtld_ref(["w"] * 100)
    assert ref is not None
    assert abs(ref[2] - 2.0) < 1e-12
    # N odd ⇒ trailing single token adds (1−1)/(1−.72) = 0 … but its
    # TTR is 1 (a fresh 1-token segment), so the partial adds 0 and
    # MTLD = N/((N−1)/2) — slightly above 2, pinned
    ref = _mtld_ref(["w"] * 101)
    assert abs(ref[2] - 101 / 50) < 1e-12


def test_cycling_vocab_monotone():
    # cycling k distinct words sustains higher TTR for longer stretches
    # → MTLD strictly grows with k
    vals = []
    for k in [2, 4, 8, 16]:
        words = [f"w{i % k}" for i in range(400)]
        ref = _mtld_ref(words)
        vals.append(ref[2] if ref else float("inf"))
    assert vals == sorted(vals)
    assert vals[0] < vals[3]


def test_palindrome_direction_symmetry():
    half = [f"w{i % 5}" for i in range(80)]
    words = half + half[::-1]
    ref = _mtld_ref(words)
    assert ref is not None
    assert abs(ref[0] - ref[1]) < 1e-12  # fwd == bwd on a palindrome


def test_honest_length_robustness_vs_ttr(spark, sf_dir):
    out = mtld_diversity(spark, sf_dir).toPandas()
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )
    ok = out.dropna(subset=["mtld"]).copy()
    assert 0.05 < (len(out) - len(ok)) / len(out) < 0.2  # the NULL band
    assert 14 < ok.mtld.median() < 24
    ln_n = np.log(ok.n_words.to_numpy(dtype=float))
    c_mtld = np.corrcoef(ln_n, ok.mtld)[0, 1]
    ttr = np.array(
        [
            len(set(raw.loc[d].text.lower().split(" ")))
            / len(raw.loc[d].text.lower().split(" "))
            for d in ok.doc_id
        ]
    )
    c_ttr = np.corrcoef(ln_n, ttr)[0, 1]
    # the T84 artifact on the same docs, and MTLD's immunity to it
    assert c_ttr < -0.8
    assert abs(c_mtld) < 0.3
