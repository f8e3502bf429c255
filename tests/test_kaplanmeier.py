"""Semantic gates for kaplanmeier_q (TS98): an independent
lifelines-style recompute from raw parquet, the KM invariants
(telescoping at-risk, monotone S, mass conservation), the
no-censoring ⇒ 1−ECDF degeneracy, a hand-worked textbook example,
and the honest censoring-tail corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.kaplanmeier_q import (
    kaplan_meier_conversion,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _km_ref(durs, evs):
    """Classic KM recompute: dict-of-times route, events before
    censorings at equal t — independent of the fold machinery."""
    n = len(durs)
    rows = {}
    for t, e in zip(durs, evs):
        d, c = rows.get(t, (0, 0))
        rows[t] = (d + e, c + (1 - e))
    out, at_risk, s = [], n, 1.0
    for t in sorted(rows):
        d, c = rows[t]
        s *= 1.0 - d / at_risk
        out.append((t, at_risk, d, c, s))
        at_risk -= d + c
    return out


def _durs_from_raw(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    wend = raw.ts.max().floor("d")
    durs, evs = [], []
    for _, g in raw.groupby("user_id"):
        d0 = g.ts.min().floor("d")
        hi = g[
            (g.event_type == "purchase")
            & (np.floor(100.0 * g.value + 0.5) > 10000)
        ]
        if len(hi):
            durs.append((hi.ts.min().floor("d") - d0).days)
            evs.append(1)
        else:
            durs.append((wend - d0).days)
            evs.append(0)
    return durs, evs


def test_matches_reference(spark, sf_dir):
    out = kaplan_meier_conversion(spark, sf_dir).toPandas()
    ref = _km_ref(*_durs_from_raw(sf_dir))
    assert len(out) == len(ref)
    for row, (t, n, d, c, s) in zip(out.itertuples(), ref):
        assert row.t_day == t and row.at_risk == n
        assert row.n_events == d and row.n_censored == c
        assert abs(row.km_survival - f6(s)) < 1e-6


def test_km_invariants(spark, sf_dir):
    out = kaplan_meier_conversion(spark, sf_dir).toPandas()
    # S non-increasing, in (0, 1]
    assert (np.diff(out.km_survival) <= 1e-12).all()
    assert out.km_survival.iloc[0] <= 1.0 and out.km_survival.min() > 0
    # at-risk telescopes exactly: n_{k+1} = n_k − d_k − c_k
    for i in range(len(out) - 1):
        assert (
            out.at_risk.iloc[i + 1]
            == out.at_risk.iloc[i]
            - out.n_events.iloc[i]
            - out.n_censored.iloc[i]
        )
    # mass conservation: everyone is an event or a censoring
    assert (
        out.n_events.sum() + out.n_censored.sum() == out.at_risk.iloc[0]
    )


def test_no_censoring_degenerates_to_ecdf():
    durs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    evs = [1] * 10
    ref = _km_ref(durs, evs)
    for t, n, d, c, s in ref:
        ecdf = sum(1 for x in durs if x <= t) / len(durs)
        assert abs(s - (1 - ecdf)) < 1e-12


def test_textbook_hand_case():
    # the classic worked example: times 1,2+,3,4+ (+ = censored)
    # S(1) = 3/4; S(3) = 3/4 · (1 − 1/2) = 3/8
    ref = _km_ref([1, 2, 3, 4], [1, 0, 1, 0])
    assert ref[0][4] == 0.75
    assert abs(ref[2][4] - 0.375) < 1e-12
    assert [r[1] for r in ref] == [4, 3, 2, 1]


def test_honest_censoring_tail(spark):
    out = kaplan_meier_conversion(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert out.at_risk.iloc[0] == 150
    assert out.n_events.sum() == 120 and out.n_censored.sum() == 30
    # the flattened tail: 20% never convert in-window
    assert 0.15 < out.km_survival.iloc[-1] < 0.25
    # KM median is 14 days; the naive converted-only mean (11.3) is
    # optimistic because it drops exactly the slowest users
    med = out[out.km_survival < 0.5].t_day.min()
    assert med == 14
    naive = (out.t_day * out.n_events).sum() / out.n_events.sum()
    assert naive < med
    # censoring masses at the window end, as it must
    assert out.n_censored.iloc[-2:].sum() == 30
