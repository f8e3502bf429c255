"""Semantic gates for tsfeatures_q (cross-engine hashes live in
test_oracle.py): every feature of the TS41 battery recomputed in plain
numpy for every synthetic series, plus physical-consistency relations
the battery must satisfy row-wise."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tsfeatures_q import _N, ts_features


@pytest.fixture(scope="module")
def loc():
    return synth.sequences_local(_N)


def _longest_run(flags):
    best = cur = 0
    for f in flags:
        cur = cur + 1 if f else 0
        best = max(best, cur)
    return best


def _naive(x):
    """Independent float-route recompute (means/σ as floats; the engine
    uses the scaled-integer forms — agreement IS the test)."""
    x = np.asarray(x, dtype=np.int64)
    n = len(x)
    s = int(x.sum())
    mean = s / n
    d = np.diff(x)
    var = x.astype(float).var()  # population
    above = x > mean
    below = x < mean
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    med2 = (
        2 * int(np.sort(x)[n // 2])
        if n % 2 == 1
        else int(np.sort(x)[n // 2 - 1]) + int(np.sort(x)[n // 2])
    )
    locs = np.flatnonzero(x == x.max())
    return {
        "s_sum": s,
        "abs_energy": int((x * x).sum()),
        "rng": int(x.max() - x.min()),
        "median2": med2,
        "abs_change_sum": int(np.abs(d).sum()),
        "var_n2": n * int((x * x).sum()) - s * s,
        "n_crossings": int((above[:-1] != above[1:]).sum()),
        "count_above": int(above.sum()),
        "count_below": int(below.sum()),
        "strike_above": _longest_run(above),
        "strike_below": _longest_run(below),
        "n_peaks": int(
            ((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])).sum()
        ),
        "c3_stat": int((x[:-2] * x[1:-1] * x[2:]).sum()),
        "lag1_dot": int((x[:-1] * x[1:]).sum()),
        "cid_sq": int((d * d).sum()),
        "beyond2_cnt": int(
            (np.abs(x - mean) > 2 * math.sqrt(var)).sum()
        ),
        "first_loc_max": int(locs[0]),
        "last_loc_max": int(locs[-1]),
        "n_distinct": len(np.unique(x)),
        "mean_abs_change": f6(np.abs(d).sum() / (n - 1)),
        "cid_ce": f6(math.sqrt(float((d * d).sum()))),
        "beyond2_ratio": f6(
            (np.abs(x - mean) > 2 * math.sqrt(var)).sum() / n
        ),
        "distinct_ratio": f6(len(np.unique(x)) / n),
    }


def test_battery_matches_numpy_recompute(spark, sf_dir, loc):
    out = ts_features(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    for row in loc.itertuples():
        if int(row.doc_id[3:]) % 5:
            continue
        ref = _naive(row.tokens.tolist())
        got = out.loc[row.doc_id]
        for k, v in ref.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, abs=2e-6), (
                    row.doc_id,
                    k,
                )
            else:
                assert got[k] == v, (row.doc_id, k, int(got[k]), v)


def test_battery_internal_consistency(spark, sf_dir):
    """Row-wise physical relations: strike ≤ count, above+below ≤ n,
    crossings < n, var_n2 ≥ 0, locations ordered, distinct ≤ n,
    beyond-2σ bounded by Chebyshev (≤ n/4 exactly for k=2)."""
    out = ts_features(spark, sf_dir).toPandas()
    n = out["n_tok"]
    assert (out["strike_above"] <= out["count_above"]).all()
    assert (out["strike_below"] <= out["count_below"]).all()
    assert (out["count_above"] + out["count_below"] <= n).all()
    assert (out["n_crossings"] < n).all()
    assert (out["var_n2"] >= 0).all()
    assert (out["first_loc_max"] <= out["last_loc_max"]).all()
    assert (out["n_distinct"] <= n).all()
    assert (out["beyond2_cnt"] * 4 <= n).all()
    # series are non-constant modular ramps: both strikes positive
    assert (out["strike_above"] > 0).all()
    assert (out["strike_below"] > 0).all()
