"""TS131 gates — seasonal-naive baseline evaluation
(operators/seasonalnaive_q.py):

1. exact integer recompute: numpy reproduces every sampled doc's
   sn_sae / n1_sae / winner flag bit-for-bit (all-int64 algebra);
2. closed-form controls through the registry function's exact
   expression tree (constructed docs): a pure linear ramp pins
   mase64 = 64.000000 EXACTLY (64h·k / h·k — the ceiling the corpus
   max 64.372 brushes), a pure period-64 sine pins sn_sae = 0 /
   mase = 0 (bit-perfect seasonal cancellation), and a constant
   series pins the NULL guard (n1_sae = 0);
3. the measured corpus pins: 495 rows, 243 seasonal-naive wins
   (49.1 % — the corpus bisects at the crossover), median
   mase64 = 1.0066.
"""

from __future__ import annotations

import numpy as np
import pytest

from dtaidistance_spark import synth


def _np_eval(tokens):
    v = np.asarray(tokens[: min(len(tokens), 512)], dtype=np.int64)
    m = len(v)
    sn = int(np.abs(v[64:m] - v[: m - 64]).sum())
    n1 = int(np.abs(v[64:m] - v[63 : m - 1]).sum())
    return m, sn, n1


def test_exact_recompute_and_corpus_pins(spark, sf_dir):
    from dtaidistance_spark.operators.seasonalnaive_q import (
        seasonal_naive_eval,
    )

    got = {
        r["doc_id"]: r for r in seasonal_naive_eval(spark, sf_dir).collect()
    }
    assert len(got) == 495
    pdf = synth.sequences_local(512)
    checked = 0
    for _, r in pdf.iterrows():
        if r["n_tok"] < 128 or checked >= 80:
            continue
        m, sn, n1 = _np_eval(list(r["tokens"]))
        g = got[r["doc_id"]]
        assert (g["m"], g["sn_sae"], g["n1_sae"]) == (m, sn, n1)
        assert g["n_eval"] == m - 64
        assert g["sn_wins"] == (1 if sn < n1 else 0)
        checked += 1
    assert checked == 80
    wins = sum(r["sn_wins"] for r in got.values())
    assert wins == 243  # 49.1 % — the crossover bisection
    mase = np.array(
        [r["mase64"] for r in got.values() if r["mase64"] is not None]
    )
    assert len(mase) == 495  # no constant series in the corpus
    assert np.median(mase) == pytest.approx(1.006626, abs=1e-6)
    assert mase.max() == pytest.approx(64.372070, abs=1e-5)


def test_closed_form_controls(spark):
    """Ramp → exactly 64, pure sine → exactly 0, constant → NULL,
    through the production tree via a synth-shaped constructed df."""
    from dtaidistance_spark.operators import seasonalnaive_q as SN

    t = np.arange(256)
    ramp = (7 * (t + 1)).tolist()  # h = 7, no wrap
    sine = np.rint(1000 * np.sin(2 * np.pi * t / 64)).astype(int).tolist()
    const = [42] * 256
    df = spark.createDataFrame(
        [("ramp", ramp), ("sine", sine), ("const", const)],
        "doc_id string, v array<bigint>",
    ).selectExpr("doc_id", "CAST(size(v) AS BIGINT) AS m", "v")
    out = df.selectExpr(
        "doc_id",
        f"{SN._sae('spark', 64)} AS sn_sae",
        f"{SN._sae('spark', 1)} AS n1_sae",
        *SN._TAIL_COLS,
    )
    g = {r["doc_id"]: r for r in out.collect()}
    assert g["ramp"]["mase64"] == 64.0  # 64h·k / h·k exactly
    assert g["sine"]["sn_sae"] == 0 and g["sine"]["mase64"] == 0.0
    assert g["sine"]["sn_wins"] == 1
    assert g["const"]["n1_sae"] == 0 and g["const"]["mase64"] is None
