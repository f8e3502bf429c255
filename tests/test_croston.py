"""Semantic gates for croston_q (TS52): the recursive Croston
definition replayed in pandas (engine computes the closed form) +
method properties."""

import math

import pandas as pd
import pytest

from dtaidistance_spark.operators.croston_q import (
    _MINP,
    croston_demand,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
_A = 0.25


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    return croston_demand(spark, sf_dir).toPandas().set_index("user_id")


def test_matches_recursive_croston(spark, sf_dir, out):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type == "purchase"].copy()
    ev["tu"] = ev.ts.astype("int64")  # microseconds
    ev["day"] = ev.tu // (86400 * 10**6)
    ev["cents"] = (100.0 * ev.value + 0.5).apply(int)
    ev = ev.sort_values(["user_id", "tu", "event_id"])
    n_checked = 0
    for uid, g in ev.groupby("user_id"):
        sizes = g.cents.tolist()
        days = g.day.tolist()
        gaps = [
            max(b - a, 1) for a, b in zip(days, days[1:])
        ]
        if len(sizes) < _MINP:
            assert uid not in out.index
            continue

        def ses(xs):
            s = float(xs[0])
            for x in xs[1:]:
                s = _A * x + (1 - _A) * s  # the RECURSIVE definition
            return s

        zh, qh = ses(sizes), ses(gaps)
        got = out.loc[uid]
        assert got.n_demands == len(sizes)
        assert got.z_hat == pytest.approx(f6(zh), abs=2e-6)
        assert got.q_hat == pytest.approx(f6(qh), abs=2e-6)
        assert got.croston_rate == pytest.approx(f6(zh / qh), abs=2e-6)
        assert got.sba_rate == pytest.approx(
            f6((1 - _A / 2) * zh / qh), abs=2e-6
        )
        n_checked += 1
    assert n_checked == len(out) > 0


def test_croston_properties(out):
    """q̂ ≥ 1 (gaps floored at one day), rates positive, SBA strictly
    below Croston (the bias correction shrinks), and the rate is
    bounded by the max demand size."""
    assert (out["q_hat"] >= 1 - 1e-9).all()
    assert (out["croston_rate"] > 0).all()
    assert (out["sba_rate"] < out["croston_rate"]).all()
    # SBA = 7/8 × Croston exactly (up to the two independent floors)
    assert (
        (out["sba_rate"] - out["croston_rate"] * 0.875).abs() < 2e-6
    ).all()
