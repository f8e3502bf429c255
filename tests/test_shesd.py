"""Semantic gates for shesd_q (TS101): the t-quantile implementation
vs pinned reference values, an independent ESD recompute, the
masking property (3σ fails, ESD succeeds), planted spike and
seasonal-pocket controls, residual-twin consistency, and the honest
error-type detection."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.shesd_q import (
    esd_lambda,
    shesd,
    shesd_anomalies,
    shesd_residuals_check,
    t_cdf,
    t_ppf,
)


def test_t_quantile_reference_values():
    # pinned standard-table values
    assert abs(t_ppf(0.975, 10) - 2.2281) < 1e-3
    assert abs(t_ppf(0.95, 30) - 1.6973) < 1e-3
    assert abs(t_ppf(0.999, 100) - 3.1737) < 1e-3
    # inverse property
    for p, df in [(0.9, 7), (0.99, 50), (0.6, 718)]:
        assert abs(t_cdf(t_ppf(p, df), df) - p) < 1e-9
    # Rosner's published example uses n=54, alpha=0.05: lambda_1 = 3.158
    assert abs(esd_lambda(54, 1) - 3.158) < 2e-3


def test_independent_esd_recompute():
    rng = np.random.RandomState(2)
    c = rng.poisson(5, 720)
    c[100] += 40
    r, steps, n_anom = shesd(c)
    # replay iteration 1 by hand
    m, s = r.astype(float).mean(), r.astype(float).std()
    dev = np.abs(r - m)
    j = int(dev.argmax())
    assert steps[0][0] == j
    assert abs(steps[0][1] - dev[j] / s) < 1e-12
    assert n_anom >= 1 and steps[0][3]


def test_masking_property():
    # TWO equal extreme spikes: the naive "remove if > 3σ of the full
    # sample" can be dragged by the pair; ESD re-estimates after each
    # removal and finds both
    rng = np.random.RandomState(7)
    c = rng.poisson(4, 720)
    c[50] += 30
    c[51] += 30
    r, steps, n_anom = shesd(c)
    assert n_anom >= 2
    found = {steps[0][0], steps[1][0]}
    assert found == {50, 51}


def test_planted_spike_and_seasonal_pocket():
    rng = np.random.RandomState(11)
    hod = np.arange(720) % 24
    base = 3 + 2 * (hod == 12)  # busiest hour-of-day = 12
    c = rng.poisson(base)
    _, steps, n_anom = shesd(c)
    quiet_anoms = n_anom
    # a spike INSIDE the busy hour still surfaces after the seasonal
    # median is removed
    c2 = c.copy()
    c2[12 + 24 * 10] += 25
    r2, steps2, n2 = shesd(c2)
    assert n2 >= 1
    assert steps2[0][0] == 12 + 24 * 10
    assert steps2[0][1] > 10
    assert n2 > quiet_anoms or quiet_anoms == 0


def test_twin_consistency(spark, sf_dir):
    # the rows-only kernel and the oracled twin must agree on the
    # residual stream they describe
    twin = (
        shesd_residuals_check(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    anoms = shesd_anomalies(spark, sf_dir).toPandas()
    assert (twin.n_hours == twin.n_hours.iloc[0]).all()
    for et, grp in anoms.groupby("event_type"):
        # every reported residual is bounded by the twin's max
        assert (
            grp.residual.abs().max() <= twin.loc[et].max_abs_r
        )
        # iteration 1 reports THE max-|deviation| hour; its residual
        # magnitude is within mean-shift of max_abs_r
        assert len(grp) == 10


def test_honest_error_type_detection(spark):
    out = shesd_anomalies(spark, "/root/testdata/sf0.01").toPandas()
    by = out.groupby("event_type").is_anomaly.sum()
    assert by["error"] == 2  # the two genuine hours, both iterations
    assert by.drop("error").sum() == 0  # everyone else quiet
    err = out[(out.event_type == "error") & (out.is_anomaly == 1)]
    assert set(err.residual) == {7, 8}
    assert (err.r_stat > err.lambda_crit).all()
    # the quiet types sit just under the line — the alpha budget
    quiet = out[(out.event_type != "error") & (out.iteration == 1)]
    assert quiet.r_stat.max() < 3.9577
    assert quiet.r_stat.min() > 3.0
