"""Kernel parity gates — FIXTURES.md §2 golden vectors (G1–G9).

These assert dtaidistance-conformant values/properties with no Spark
session, so they run fast under `python -m pytest -x -q`.
"""

import math

import numpy as np
import pytest

from dtaidistance_spark import kernels as K

S1 = [0.0, 0, 1, 2, 1, 0, 1, 0, 0]
S2 = [0.0, 1, 2, 0, 0, 0, 0, 0, 0]


def test_g1_canonical_distance():
    assert K.dtw_distance(S1, S2) == pytest.approx(math.sqrt(2), abs=1e-12)


def test_g2_euclidean():
    assert K.ed_distance(S1, S2) == pytest.approx(math.sqrt(8), abs=1e-12)


def test_g3_band_monotone():
    full = K.dtw_distance(S1, S2)
    for w in (1, 2, 3, 5):
        assert K.dtw_distance(S1, S2, window=w) >= full - 1e-12
    # window=1 is the pure diagonal == euclidean on equal lengths
    assert K.dtw_distance(S1, S2, window=1) == pytest.approx(
        math.sqrt(8), abs=1e-12
    )


def test_g4_pruning_exact():
    assert K.dtw_distance(S1, S2, use_pruning=True) == pytest.approx(
        K.dtw_distance(S1, S2), abs=1e-12
    )


def test_g5_psi_relaxation():
    x = np.linspace(0, 20, 100)
    s1 = np.sin(x)
    s2 = np.sin(x + math.pi / 2)
    d0 = K.dtw_distance(s1, s2, psi=0)
    d2 = K.dtw_distance(s1, s2, psi=2)
    d20 = K.dtw_distance(s1, s2, psi=20)
    assert d2 <= d0
    assert d20 < d0 * 0.2  # phase shift absorbed by boundary relaxation
    # psi must never increase the distance
    assert d20 <= d2 <= d0 + 1e-12


def test_g6_warping_path_properties():
    d, m = K.warping_paths(S1, S2)
    assert d == pytest.approx(math.sqrt(2), abs=1e-12)
    assert m[-1, -1] == pytest.approx(math.sqrt(2), abs=1e-12)
    path = K.best_path(m)
    assert path[0] == (0, 0)
    assert path[-1] == (len(S1) - 1, len(S2) - 1)
    di = np.diff([p[0] for p in path])
    dj = np.diff([p[1] for p in path])
    assert (di >= 0).all() and (dj >= 0).all()
    assert ((di + dj) >= 1).all() and (di <= 1).all() and (dj <= 1).all()
    # path cost re-accumulates to the distance
    cost = sum((S1[i] - S2[j]) ** 2 for i, j in path)
    assert math.sqrt(cost) == pytest.approx(d, abs=1e-12)


def test_g7_dba_fixed_point():
    s = np.array([0.0, 1, 2, 3, 2, 1, 0])
    out = K.dba([s], center=s, max_it=5)
    np.testing.assert_allclose(out, s, atol=1e-12)


def _seeded_pairs(n=100, seed=7):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        la = int(rng.integers(8, 40))
        lb = int(rng.integers(8, 40))
        yield rng.normal(size=la), rng.normal(size=lb)


def test_g8_lb_keogh_admissible():
    for a, b in _seeded_pairs():
        for w in (None, 5, 10):
            lb = K.lb_keogh(a, b, window=w)
            d = K.dtw_distance(a, b, window=w)
            assert lb <= d + 1e-9, (len(a), len(b), w, lb, d)


def test_g8b_envelope_precompute_matches():
    rng = np.random.default_rng(3)
    a = rng.normal(size=30)
    b = rng.normal(size=30)
    env = K.lb_keogh_envelope(b, window=5)
    assert K.lb_keogh(a, b, window=5, envelope=env) == pytest.approx(
        K.lb_keogh(a, b, window=5), abs=1e-12
    )


def test_g9_lb_kim_admissible():
    for a, b in _seeded_pairs(seed=11):
        assert K.lb_kim(a, b) <= K.dtw_distance(a, b) + 1e-9


def test_max_dist_abandons():
    d = K.dtw_distance(S1, S2)
    assert K.dtw_distance(S1, S2, max_dist=d / 2) == np.inf
    assert K.dtw_distance(S1, S2, max_dist=d * 2) == pytest.approx(d, abs=1e-12)
    # max_dist is in DISTANCE units (sqrt domain): a bound just above d keeps d
    assert K.dtw_distance(S1, S2, max_dist=d * 1.01) == pytest.approx(d, abs=1e-12)
    assert K.dtw_distance(S1, S2, max_dist=d * 0.99) == np.inf


def test_max_length_diff():
    assert K.dtw_distance([1.0, 2, 3], [1.0] * 10, max_length_diff=3) == np.inf


def test_penalty_increases_warping_cost():
    d0 = K.dtw_distance(S1, S2)
    dp = K.dtw_distance(S1, S2, penalty=2)
    assert dp >= d0
    # identical series: no warping -> penalty irrelevant
    assert K.dtw_distance(S1, S1, penalty=2) == 0.0


def test_max_step():
    # all steps cost > max_step**2 -> inf
    assert K.dtw_distance([0.0, 0, 0], [5.0, 5, 5], max_step=1) == np.inf


def test_unequal_lengths():
    a = [0.0, 1, 2, 3]
    b = [0.0, 1, 1, 2, 2, 3, 3]
    d = K.dtw_distance(a, b)
    assert d == pytest.approx(0.0, abs=1e-12)  # b is a warped copy of a


def test_inner_dist_euclidean():
    # inner 'euclidean': costs are |x-y|, no final sqrt
    d = K.dtw_distance(S1, S2, inner_dist="euclidean")
    assert d == pytest.approx(2.0, abs=1e-12)  # two unit mismatches


def test_batch_matches_scalar():
    rng = np.random.default_rng(5)
    q = rng.normal(size=25)
    members = [rng.normal(size=int(rng.integers(10, 30))) for _ in range(17)]
    c_pad = max(len(m) for m in members)
    batch = np.zeros((len(members), c_pad))
    lengths = np.array([len(m) for m in members])
    for i, m in enumerate(members):
        batch[i, : len(m)] = m
    for w, psi in ((None, None), (5, None), (None, 2), (8, 1)):
        got = K.dtw_distance_batch(q, batch, lengths, window=w, psi=psi)
        want = np.array(
            [K.dtw_distance(q, m, window=w, psi=psi) for m in members]
        )
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_warp_and_amount():
    path = K.warping_path(S1, S2)
    assert K.warping_amount(path) >= 0
    warped = K.warp(S1, S2, path=path)
    assert len(warped) == len(S2)


def test_dba_batch_matches_scalar():
    rng = np.random.default_rng(21)
    members = rng.normal(size=(13, 40))
    for w in (None, 6, 12):
        got = K.dba_batch(members, max_it=3, window=w)
        want = K.dba(list(members), max_it=3, window=w)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_dba_update_batch_matches_update():
    rng = np.random.default_rng(22)
    members = rng.normal(size=(7, 32))
    center = rng.normal(size=32)
    got = K.dba_update_batch(center, members, window=5)
    want = K.dba_update(center, list(members), window=5)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_dba_converges_to_middle():
    base = np.sin(np.linspace(0, 6, 40))
    shifted = [np.roll(base, k) for k in (-1, 0, 1)]
    center = K.dba(shifted, max_it=10, window=5)
    assert len(center) == 40
    d_center = np.mean([K.dtw_distance(center, s) for s in shifted])
    d_raw = np.mean([K.dtw_distance(shifted[0], s) for s in shifted])
    assert d_center <= d_raw + 1e-9


class TestWeightedDTW:
    """C5 kernel property gates (reference mount empty: the invariant
    that must survive reconciliation is identity-weights == K1)."""

    def _series(self):
        from dtaidistance_spark import synth

        pdf = synth.sequences_local(6)
        return [
            K.paa(np.asarray(t, dtype=np.float64), 32) for t in pdf["tokens"]
        ]

    def test_identity_weights_equal_plain_dtw(self):
        arrs = self._series()
        ident = np.tile([0.0, 1.0, 0.0, 1.0], (32, 1))
        for a, b in zip(arrs[:-1], arrs[1:]):
            for win in (None, 4):
                dw = K.dtw_weighted_distance(a, b, weights=ident, window=win)
                d = K.dtw_distance(a, b, window=win)
                assert dw == d  # bit-identical

    def test_none_weights_delegate(self):
        arrs = self._series()
        assert K.dtw_weighted_distance(arrs[0], arrs[1]) == K.dtw_distance(
            arrs[0], arrs[1]
        )

    def test_dead_zone_zeroes_small_residuals(self):
        a = np.array([0.0, 1.0, 2.0, 3.0])
        b = a + 0.4  # every residual inside the dead zone
        w = np.tile([0.5, 1.0, 0.5, 1.0], (4, 1))
        assert K.dtw_weighted_distance(a, b, weights=w, window=1) == 0.0

    def test_weights_scale_monotonically(self):
        arrs = self._series()
        a, b = arrs[0], arrs[1]
        w1 = np.tile([0.0, 1.0, 0.0, 1.0], (32, 1))
        w2 = np.tile([0.0, 2.0, 0.0, 2.0], (32, 1))
        d1 = K.dtw_weighted_distance(a, b, weights=w1, window=8)
        d2 = K.dtw_weighted_distance(a, b, weights=w2, window=8)
        assert d1 < d2 <= 2 * d1 + 1e-9  # path may re-route, never exceed 2x

    def test_asymmetric_sides(self):
        # only positive residuals (s1 above s2) are penalized
        a = np.array([5.0, 5.0, 5.0])
        b = np.array([4.0, 6.0, 4.0])
        w_pos_only = np.tile([1e9, 0.0, 0.0, 1.0], (3, 1))
        d = K.dtw_weighted_distance(a, b, weights=w_pos_only, window=0)
        assert d == pytest.approx(np.sqrt(1.0 + 0.0 + 1.0))

    def test_compat_alias(self):
        from dtaidistance_spark.compat import dtw_weighted

        a, b = [0.0, 1.0, 2.0], [0.0, 2.0, 2.0]
        ident = np.tile([0.0, 1.0, 0.0, 1.0], (3, 1))
        got = dtw_weighted.distance(a, b, weights=ident)
        assert got == K.dtw_distance(np.asarray(a), np.asarray(b))


class TestMannKendallMergeCount:
    """The TS14 scale kernel: merge-count S == the O(n^2) pair sum."""

    @staticmethod
    def _brute(v):
        v = np.asarray(v, dtype=np.float64)
        n = len(v)
        s = sum(
            int(np.sign(v[j] - v[i]))
            for i in range(n - 1)
            for j in range(i + 1, n)
        )
        t = sum(
            1
            for i in range(n - 1)
            for j in range(i + 1, n)
            if v[i] == v[j]
        )
        return s, t

    def test_fuzz_with_ties(self):
        rng = np.random.default_rng(7)
        for trial in range(40):
            n = int(rng.integers(2, 120))
            # heavy ties: values drawn from a small integer alphabet
            v = rng.integers(0, max(2, n // 4), size=n).astype(float)
            s, t = self._brute(v)
            assert K.mk_s_stat(v) == s, (trial, v)
            assert K.mk_tied_pairs(v) == t, (trial, v)

    def test_edge_shapes(self):
        assert K.mk_s_stat([1.0, 2.0]) == 1
        assert K.mk_s_stat([2.0, 1.0]) == -1
        assert K.mk_s_stat([5.0, 5.0]) == 0
        assert K.mk_tied_pairs([5.0, 5.0, 5.0]) == 3
        # strictly increasing: S = n*(n-1)/2
        v = np.arange(257, dtype=float)
        assert K.mk_s_stat(v) == 257 * 256 // 2
        assert K.mk_tied_pairs(v) == 0


class TestButterworthS2:
    """S2 upstream-true smoothing: butter(2, wn) + filtfilt, scipy-free."""

    def test_coefficients_match_published_butter_2_02(self):
        # scipy.signal.butter(2, 0.2) — published rounded values
        b, a = K.butter2_lowpass(0.2)
        np.testing.assert_allclose(
            b, [0.0674553, 0.1349105, 0.0674553], atol=1e-6
        )
        np.testing.assert_allclose(a, [1.0, -1.1429805, 0.4128016], atol=1e-6)
        # unity DC gain by construction
        assert b.sum() == pytest.approx(a.sum(), rel=1e-15)

    def test_defining_butterworth_magnitude_property(self):
        """Independent analytic gate: under the bilinear transform the
        digital magnitude must be EXACTLY the Butterworth response in
        prewarped frequency, |H(e^jw)|^2 = 1/(1 + (tan(w/2)/tan(wc/2))^4),
        with the half-power point landing exactly on the cutoff."""
        for wn in (0.05, 0.2, 0.35, 0.7):
            b, a = K.butter2_lowpass(wn)
            wc = np.pi * wn
            for w in (0.1 * np.pi, 0.3 * np.pi, 0.5 * np.pi, 0.9 * np.pi):
                z = np.exp(-1j * w)
                h = (b[0] + b[1] * z + b[2] * z * z) / (
                    1.0 + a[1] * z + a[2] * z * z
                )
                want = 1.0 / (1.0 + (np.tan(w / 2) / np.tan(wc / 2)) ** 4)
                assert abs(h) ** 2 == pytest.approx(want, abs=1e-12)
            zc = np.exp(-1j * wc)
            hc = (b[0] + b[1] * zc + b[2] * zc * zc) / (
                1.0 + a[1] * zc + a[2] * zc * zc
            )
            assert abs(hc) ** 2 == pytest.approx(0.5, abs=1e-12)

    def test_lfilter_fir_equals_convolution(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=50)
        b = np.array([0.5, 0.3, 0.2])
        got = K.lfilter(b, [1.0], x)
        want = np.convolve(x, b)[: len(x)]
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_lfilter_zi_steady_state(self):
        b, a = K.butter2_lowpass(0.3)
        zi = K.lfilter_zi(b, a)
        y, _ = K.lfilter(b, a, np.full(20, 7.5), zi=zi * 7.5)
        np.testing.assert_allclose(y, 7.5, rtol=1e-12)

    def test_filtfilt_zero_phase_and_attenuation(self):
        t = np.arange(400, dtype=np.float64)
        slow = np.sin(2 * np.pi * t / 200)          # f = 0.005 cycles/sample
        fast = 0.5 * np.sin(2 * np.pi * t / 4)       # f = 0.25 (Nyquist/2)
        b, a = K.butter2_lowpass(0.05)
        y = K.filtfilt(b, a, slow + fast)
        # the slow component passes nearly untouched, the fast one dies
        mid = slice(50, 350)
        assert np.max(np.abs(y[mid] - slow[mid])) < 0.005
        # zero phase: peak of the recovered slow wave stays at t=50
        assert abs(int(np.argmax(y[:150])) - 50) <= 1
        # time-reversal invariance of the zero-phase filter, up to the
        # edge transient (padlen=9 << the wn=0.05 time constant, as in
        # scipy's default — transients enter from opposite ends)
        y_rev = K.filtfilt(b, a, (slow + fast)[::-1])[::-1]
        np.testing.assert_allclose(y[mid], y_rev[mid], atol=2e-3)

    def test_filtfilt_preserves_constant_and_line(self):
        b, a = K.butter2_lowpass(0.2)
        np.testing.assert_allclose(
            K.filtfilt(b, a, np.full(30, 3.25)), 3.25, rtol=1e-12
        )
        # a ramp survives up to the documented O(|pole|^padlen) edge
        # transient (the odd extension is exact; zi assumes a constant)
        line = 0.5 * np.arange(60) - 4.0
        got = K.filtfilt(b, a, line)
        assert np.max(np.abs(got - line)) < 0.02
        assert np.max(np.abs(got[10:-10] - line[10:-10])) < 1e-3

    def test_smoothing_butterworth_guards(self):
        with pytest.raises(ValueError, match="smooth"):
            K.smoothing_butterworth(np.arange(50.0), 0.7)
        with pytest.raises(ValueError, match="too short"):
            K.smoothing_butterworth(np.arange(5.0), 0.1)

    def test_compat_surface(self):
        from dtaidistance_spark.compat import preprocessing

        x = np.sin(np.arange(100) / 7.0) + np.arange(100) * 0.01
        got = preprocessing.smoothing(x, smooth=0.1)
        b, a = K.butter2_lowpass(0.2)
        np.testing.assert_allclose(got, K.filtfilt(b, a, x), rtol=1e-12)
        d = preprocessing.differencing(x, smooth=0.1)
        assert len(d) == 99 and np.isfinite(d).all()


class TestDbaSampling:
    """A1 signature parity: nb_initial_samples / nb_prob_samples."""

    @staticmethod
    def _members(seed=9, n=12, length=32):
        rng = np.random.default_rng(seed)
        base = np.sin(np.arange(length) / 3.0) * 10
        return [base + rng.normal(0, 1.0, size=length) for _ in range(n)]

    def test_prob_samples_full_equals_default(self):
        ms = self._members()
        a = K.dba(ms, max_it=5)
        b = K.dba(ms, max_it=5, nb_prob_samples=len(ms))
        c = K.dba(ms, max_it=5, nb_prob_samples=10_000)
        assert np.array_equal(a, b) and np.array_equal(a, c)

    def test_prob_samples_subset_deterministic_and_sane(self):
        ms = self._members()
        a = K.dba(ms, max_it=5, nb_prob_samples=4)
        b = K.dba(ms, max_it=5, nb_prob_samples=4)
        assert np.array_equal(a, b)
        assert a.shape == K.dba(ms, max_it=5).shape
        # still a barycenter-ish object: closer on average than a member
        mean_d = np.mean([K.dtw_distance(a, m) for m in ms])
        worst_member = max(
            np.mean([K.dtw_distance(x, m) for m in ms]) for x in ms[:3]
        )
        assert mean_d < worst_member

    def test_initial_samples_one_is_median_default(self):
        ms = self._members()
        assert np.array_equal(
            K.dba(ms, max_it=3), K.dba(ms, max_it=3, nb_initial_samples=1)
        )

    def test_initial_samples_picks_lower_cost_start(self):
        # plant an outlier at the median-length slot position so the
        # default start is bad; multi-start must not do worse
        ms = self._members()
        ms[len(ms) // 2] = ms[len(ms) // 2] + 500.0

        def cost(center):
            return sum(K.dtw_distance(center, m) for m in ms)

        c_multi = K.dba(ms, max_it=1, nb_initial_samples=6)
        c_def = K.dba(ms, max_it=1)
        assert cost(c_multi) <= cost(c_def) + 1e-9

    def test_compat_passthrough(self):
        from dtaidistance_spark.compat import dtw_barycenter

        ms = self._members()
        got = dtw_barycenter.dba_loop(
            ms, max_it=4, nb_prob_samples=len(ms), nb_initial_samples=1
        )
        assert np.array_equal(got, K.dba(ms, max_it=4))
        # mask parity
        mask = [i % 2 == 0 for i in range(len(ms))]
        got_m = dtw_barycenter.dba(ms, mask=mask, max_it=4)
        want_m = K.dba([m for m, k in zip(ms, mask) if k], max_it=4)
        assert np.array_equal(got_m, want_m)
