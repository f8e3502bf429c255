"""Semantic gates for randtests_q: every count and z recomputed in
numpy, plus the statistical reading (the deterministic ramps are NOT
random — the battery must say so)."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.randtests_q import _N, randomness_tests

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ref(x):
    x = np.asarray(x, dtype=np.int64)
    n = len(x)
    d = np.diff(x)
    t_cnt = int(((d[:-1] * d[1:]) < 0).sum())
    d_cnt = int((d > 0).sum())
    srt = np.sort(x)
    med2 = (
        2 * int(srt[n // 2])
        if n % 2 == 1
        else int(srt[n // 2 - 1]) + int(srt[n // 2])
    )
    sgn = np.sign(2 * x - med2)
    kept = sgn[sgn != 0]
    n1 = int((kept == 1).sum())
    n2 = int((kept == -1).sum())
    r = 0 if len(kept) == 0 else 1 + int((kept[:-1] != kept[1:]).sum())
    z_t = (t_cnt - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    m = n1 + n2
    z_r = None
    if n1 and n2 and m > 1:
        er = 2 * n1 * n2 / m + 1
        vr = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (m * m * (m - 1))
        z_r = (r - er) / math.sqrt(vr)
    z_d = (d_cnt - (n - 1) / 2) / math.sqrt((n + 1) / 12)
    return med2, t_cnt, d_cnt, n1, n2, r, z_t, z_r, z_d


def test_counts_and_z_match_numpy(spark, sf_dir):
    out = randomness_tests(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::7]:
        med2, t, dc, n1, n2, r, z_t, z_r, z_d = _ref(
            row.tokens.tolist()
        )
        got = out.loc[row.doc_id]
        assert got.med2 == med2 and got.t_cnt == t and got.d_cnt == dc
        assert got.n1 == n1 and got.n2 == n2 and got.r_cnt == r
        assert got.z_turning == pytest.approx(z_t, abs=2e-6)
        if z_r is not None:
            assert got.z_runs == pytest.approx(z_r, abs=2e-6)
        assert got.z_diffsign == pytest.approx(z_d, abs=2e-6)
        assert got.rej_turning == (1 if abs(z_t) > 1.96 else 0)


def test_battery_detects_nonrandomness(spark, sf_dir):
    """The period-64 ramps are strongly non-random in ORDER structure:
    the turning-point test must reject on the vast majority (smooth
    series turn far less often than noise), and the runs test must
    show far fewer median-runs than chance on most series."""
    out = randomness_tests(spark, sf_dir).toPandas()
    assert out["rej_turning"].mean() > 0.9
    # runs depart in BOTH directions (period-64 oscillation around the
    # median gives some series too many alternations, others too few) —
    # the honest gate is |z| rejection, not a sign
    assert (out["z_runs"].dropna().abs() > 1.96).mean() > 0.9
    assert (out["z_diffsign"].abs() > 1.96).mean() > 0.9
