"""Semantic gates for burstiness_q (T62) and conformal_q (TS49)."""

import math
from collections import Counter

import pandas as pd
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.burstiness_q import (
    _N,
    _TOPK,
    token_burstiness,
)
from dtaidistance_spark.operators.conformal_q import (
    _P,
    _TEST,
    conformal_forecast,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_burstiness_matches_counter(spark, sf_dir):
    loc = synth.sequences_local(_N)
    per_doc = {}
    for row in loc.itertuples():
        per_doc[row.doc_id] = Counter(int(t) for t in row.tokens.tolist())
    cf = Counter()
    df1 = Counter()
    df2 = Counter()
    sc2 = Counter()
    for cnts in per_doc.values():
        for t, c in cnts.items():
            cf[t] += c
            df1[t] += 1
            if c >= 2:
                df2[t] += 1
            sc2[t] += c * c
    out = token_burstiness(spark, sf_dir).toPandas()
    assert len(out) == _TOPK
    want = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]
    assert {int(t) for t in out.tok} == {t for t, _ in want}
    for r in out.itertuples():
        t = int(r.tok)
        assert r.cf == cf[t] and r.df1 == df1[t] and r.df2 == df2[t]
        assert r.sc2 == sc2[t]
        assert r.vmr_n2 == _N * sc2[t] - cf[t] * cf[t]
        assert r.adaptation == pytest.approx(
            f6(df2[t] / df1[t]), abs=2e-6
        )
        assert r.burstiness == pytest.approx(
            f6(cf[t] / df1[t]), abs=2e-6
        )


def test_burstiness_bounds(spark, sf_dir):
    out = token_burstiness(spark, sf_dir).toPandas()
    assert out["adaptation"].between(0, 1).all()
    assert (out["burstiness"] >= 1 - 1e-9).all()
    assert (out["df2"] <= out["df1"]).all()


@pytest.fixture(scope="module")
def conf(spark, sf_dir):
    return conformal_forecast(spark, sf_dir).toPandas()


def test_conformal_matches_pandas(spark, sf_dir, conf):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # parquet ts is datetime64[us] — integer view is MICROseconds
    ev["day"] = ev.ts.astype("int64") // (86400 * 10**6)
    daily = (
        ev.groupby(["event_type", "day"])["value"]
        .agg(["sum", "count"])
        .reset_index()
    )
    daily["dm"] = (daily["sum"] / daily["count"]).map(f6)
    got = conf.set_index(["event_type", "day"])
    n_rows = 0
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        n = len(g)
        fcst = g.dm.shift(_P)
        resid = (g.dm - fcst).abs()
        cal = resid[(~fcst.isna()) & (g.index < n - _TEST)]
        n_cal = len(cal)
        k = (4 * (n_cal + 1) + 4) // 5
        if k > n_cal:
            continue
        qhat = sorted(cal)[k - 1]
        for i in range(max(n - _TEST, _P), n):
            row = got.loc[(et, g.day[i])]
            n_rows += 1
            assert row.n_cal == n_cal
            assert row.qhat == pytest.approx(f6(qhat), abs=2e-6)
            assert row.fcst == pytest.approx(g.dm[i - _P], abs=2e-6)
            want_cov = (
                1
                if g.dm[i - _P] - qhat <= g.dm[i] <= g.dm[i - _P] + qhat
                else 0
            )
            assert row.covered == want_cov
    assert n_rows == len(conf) > 0


def test_conformal_coverage_guarantee(conf):
    """Split conformal at α = 0.2: expected coverage ≥ 0.8. On a
    finite 7-day test window per type, the AGGREGATE coverage must
    sit near or above the guarantee."""
    assert conf["covered"].mean() >= 0.7
    assert (conf["lo"] <= conf["hi"]).all()
    assert (conf["qhat"] >= 0).all()
