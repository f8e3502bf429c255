"""Semantic gates for richness_q (T84): full pandas recompute from
the raw parquet text for every doc, the K↔D algebraic identity, the
saturated-corner hand cases, the TTR length artifact vs the
length-robust pair, and the honest flat-soup bands."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.richness_q import lexical_richness

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _rich_np(text):
    f = Counter(text.lower().split(" "))
    n = sum(f.values())
    v = len(f)
    s2 = sum(c * c for c in f.values())
    hapax = sum(1 for c in f.values() if c == 1)
    dis = sum(1 for c in f.values() if c == 2)
    if n < 2:
        return None
    return {
        "n_words": n,
        "v_types": v,
        "s2": s2,
        "hapax": hapax,
        "dis": dis,
        "yule_k": 1e4 * (s2 - n) / (n * n),
        "simpson_d": (s2 - n) / (n * (n - 1)),
        "ttr": v / n,
        "hapax_ratio": hapax / v,
        "sichel_s": dis / v,
        "herdan_c": math.log(v) / math.log(n) if v >= 2 else None,
    }


def test_matches_pandas(spark, sf_dir):
    out = (
        lexical_richness(spark, sf_dir).toPandas().set_index("doc_id")
    )
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == len(raw)
    for _, r in raw.iterrows():
        ref = _rich_np(r.text)
        row = out.loc[r.doc_id]
        for k in ["n_words", "v_types", "s2", "hapax", "dis"]:
            assert row[k] == ref[k], (r.doc_id, k)
        for k in ["yule_k", "simpson_d", "ttr", "hapax_ratio",
                  "sichel_s"]:
            assert abs(row[k] - f6(ref[k])) < 1e-6, (r.doc_id, k)
        if ref["herdan_c"] is not None:
            assert abs(row.herdan_c - f6(ref["herdan_c"])) < 1e-6


def test_k_d_identity(spark, sf_dir):
    # Yule's K = 10⁴ · D · (N−1)/N exactly (both clear the same Σf²−N)
    out = lexical_richness(spark, sf_dir).toPandas()
    ok = out[out.n_words >= 2]
    lhs = ok.yule_k
    rhs = 1e4 * ok.simpson_d * (ok.n_words - 1) / ok.n_words
    assert (abs(lhs - rhs) < 2e-2).all()  # f6 rounding on each side


def test_saturated_corners():
    same = _rich_np("word " * 100 + "word")
    assert same["simpson_d"] == 1.0
    assert abs(same["yule_k"] - 1e4 * (1 - 1 / same["n_words"])) < 1e-9
    assert same["ttr"] == 1 / 101 and same["hapax_ratio"] == 0.0
    dist = _rich_np(" ".join(f"w{i}" for i in range(100)))
    assert dist["yule_k"] == 0.0 and dist["simpson_d"] == 0.0
    assert dist["ttr"] == 1.0 and dist["hapax_ratio"] == 1.0
    assert dist["sichel_s"] == 0.0


def test_length_artifact_vs_robust(spark, sf_dir):
    # TTR/hapax fall with doc length (artifact); simpson/yule do not
    out = lexical_richness(spark, sf_dir).toPandas()
    ln_n = np.log(out.n_words)
    c_ttr = np.corrcoef(ln_n, out.ttr)[0, 1]
    c_hap = np.corrcoef(ln_n, out.hapax_ratio)[0, 1]
    c_sim = np.corrcoef(ln_n, out.simpson_d)[0, 1]
    assert c_ttr < -0.8 and c_hap < -0.6
    assert abs(c_sim) < 0.5  # length-robust by design


def test_honest_flat_soup_bands(spark, sf_dir):
    out = lexical_richness(spark, sf_dir).toPandas()
    # simpson at the flat-soup collision line ~1/V; K its 1e4 twin
    assert 0.02 < out.simpson_d.median() < 0.05
    assert 200 < out.yule_k.median() < 500
    assert 0.3 < out.ttr.median() < 0.6
    assert 0.6 < out.herdan_c.median() < 0.95
