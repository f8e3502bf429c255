"""Semantic gates for ses_q (TS81): direct numpy SES-recursion
recompute of every 7th series (sse/sae/final level/MASE), exact
naive int64 sums, the constant-series and two-point hand cases, and
the honest measured beats-naive split."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.ses_q import _N, ses_forecast_eval

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731

_A = 0.2


def _ses(y):
    y = np.asarray(y, dtype=np.float64)
    l = y[0]
    sse = sae = 0.0
    for t in range(1, len(y)):
        e = y[t] - l
        sse += e * e
        sae += abs(e)
        l = _A * y[t] + (1.0 - _A) * l
    return sse, sae, l


def test_matches_numpy(spark):
    out = ses_forecast_eval(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        sse, sae, lvl = _ses(y)
        d = np.diff(y).astype(object)
        row = out.loc[row_l.doc_id]
        assert row.sad == int(sum(abs(v) for v in d))
        assert row.nsse == int(sum(v * v for v in d))
        # sequential float fold: tolerate only rounding-of-display slack
        assert abs(row.ses_sse - f6(sse)) < max(1e-6, 1e-12 * sse)
        assert abs(row.ses_sae - f6(sae)) < max(1e-6, 1e-12 * sae)
        assert abs(row.final_level - f6(lvl)) < 1e-6
        if row.sad > 0 and len(y) >= 3:
            assert abs(row.mase - f6(sae / row.sad)) < max(
                1e-6, 1e-12 * sae / row.sad
            )
            assert row.ses_beats_naive == (1 if sse < row.nsse else 0)
        checked += 1
    assert checked >= 60


def test_constant_series_hand_case():
    sse, sae, lvl = _ses(np.full(50, 7))
    # 0.2/0.8 are not exactly representable: the level re-derives 7
    # only to ~1e-15 per step, so the error sums are ~1e-28, not 0
    assert sse < 1e-20 and sae < 1e-10
    assert abs(lvl - 7.0) < 1e-12


def test_step_series_hand_case():
    # y = [0]*5 + [10]*5: first error at the jump is 10, then the
    # level closes in geometrically at rate (1-α)
    y = np.array([0] * 5 + [10] * 5)
    sse, sae, lvl = _ses(y)
    errs = []
    l = 0.0
    for t in range(1, 10):
        errs.append(y[t] - l)
        l = _A * y[t] + 0.8 * l
    assert abs(sae - sum(abs(e) for e in errs)) < 1e-12
    assert abs(errs[4] - 10.0) < 1e-12
    assert 0 < errs[8] < errs[5] < errs[4]  # geometric closing


def test_honest_beats_naive_split(spark):
    out = ses_forecast_eval(spark, "").toPandas()
    ok = out.dropna(subset=["mase"])
    rate = (ok.ses_beats_naive == 1).mean()
    assert 0.6 <= rate <= 0.9  # measured 0.78
    assert 0.6 < ok.mase.median() < 0.9  # measured 0.73
    assert ok.mase.max() > 2.0  # the clean-trend losing tail is real
