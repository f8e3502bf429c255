"""Property-based gates (hypothesis) — Spark-free, fast.

The reference's strongest correctness idea is dual-implementation
cross-checking (SURVEY §5.1); hypothesis extends that from golden
vectors to randomized adversarial inputs:

- Gorilla: encode→decode identity over arbitrary float64 bit patterns
  (incl. NaN payloads, infinities, subnormals) and arbitrary sorted
  int64-µs timestamps; vectorized and reference ('10'-branch) encoders
  must agree after decode.
- DTW: metric-style invariants that hold for ANY input — symmetry,
  identity, window-monotonicity, Euclidean upper bound, LB_Keogh /
  LB_Kim admissibility — cross-checked against the O(n·m) brute
  recursion on small cases.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dtaidistance_spark import kernels as K
from dtaidistance_spark.encoding import gorilla as G

# -- strategies -------------------------------------------------------------

f64 = st.floats(
    allow_nan=True, allow_infinity=True, allow_subnormal=True, width=64
)
finite = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e6, max_value=1e6
)
series = st.lists(finite, min_size=1, max_size=24).map(
    lambda xs: np.asarray(xs, dtype=np.float64)
)


@st.composite
def ts_axis(draw):
    n = draw(st.integers(1, 200))
    deltas = draw(
        st.lists(
            st.integers(0, 2**40), min_size=n, max_size=n
        )
    )
    return np.cumsum(np.asarray(deltas, dtype=np.int64))


# -- gorilla ----------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(f64, min_size=1, max_size=64))
def test_gorilla_values_roundtrip_any_bits(xs):
    vals = np.asarray(xs, dtype=np.float64)
    dec = G.decode_values(G.encode_values(vals), float(vals[0]), len(vals))
    # bit-exact comparison (NaN payloads included) — float compare would
    # treat NaN != NaN and -0.0 == 0.0
    assert np.array_equal(dec.view(np.uint64), vals.view(np.uint64))
    # the reference encoder (with the '10' reuse branch) must decode to
    # the same bits through the same decoder
    dec2 = G.decode_values(G.encode_values_ref(vals), float(vals[0]), len(vals))
    assert np.array_equal(dec2.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(ts_axis())
def test_gorilla_timestamps_roundtrip(ts):
    dec = G.decode_timestamps(G.encode_timestamps(ts), int(ts[0]), len(ts))
    assert np.array_equal(dec, ts)


# -- DTW kernel invariants --------------------------------------------------


def _brute_dtw(a, b):
    """O(n·m) reference recursion, squared-euclidean inner distance."""
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
    return float(np.sqrt(D[n, m]))


@settings(max_examples=150, deadline=None)
@given(series, series)
def test_dtw_matches_brute_recursion(a, b):
    got = K.dtw_distance(a, b)
    want = _brute_dtw(a, b)
    assert abs(got - want) < 1e-9 * max(1.0, want)


@settings(max_examples=100, deadline=None)
@given(series, series)
def test_dtw_symmetry_and_identity(a, b):
    assert K.dtw_distance(a, a) == 0.0
    d_ab = K.dtw_distance(a, b)
    d_ba = K.dtw_distance(b, a)
    assert abs(d_ab - d_ba) < 1e-9 * max(1.0, d_ab)


@settings(max_examples=100, deadline=None)
@given(series, series, st.integers(1, 8))
def test_dtw_window_monotone_and_euclid_bound(a, b, w):
    """Tighter bands can only increase cost; the unbanded distance is
    bounded above by Euclidean (equal lengths)."""
    d_w = K.dtw_distance(a, b, window=w)
    d_full = K.dtw_distance(a, b)
    assert d_full <= d_w + 1e-9
    if len(a) == len(b):
        assert d_full <= K.ed_distance(a, b) + 1e-9


@settings(max_examples=100, deadline=None)
@given(series, series, st.integers(1, 8))
def test_lower_bounds_admissible(a, b, w):
    d = K.dtw_distance(a, b, window=w)
    assert K.lb_kim(a, b) <= d + 1e-9
    lo, hi = K.lb_keogh_envelope(b, w)
    assert K.lb_keogh(a, b, window=w) <= d + 1e-9


@settings(max_examples=50, deadline=None)
@given(series, series)
def test_batched_dtw_equals_scalar(a, b):
    lengths = np.asarray([len(b)], dtype=np.int64)
    M = np.zeros((1, len(b)))
    M[0] = b
    got = K.dtw_distance_batch(a, M, lengths, window=4)[0]
    want = K.dtw_distance(a, b, window=4)
    assert abs(got - want) < 1e-9 * max(1.0, want)


@settings(max_examples=100, deadline=None)
@given(series, series, st.floats(min_value=0.5, max_value=50.0), st.integers(1, 8))
def test_batched_early_abandon_exact(a, b, thr, w):
    """With max_dist set, the batched DP returns the exact distance for
    below-threshold pairs and INF-or-exact for abandoned ones."""
    lengths = np.asarray([len(b)], dtype=np.int64)
    M = np.zeros((1, len(b)))
    M[0] = b
    got = K.dtw_distance_batch(a, M, lengths, window=w, max_dist=thr)[0]
    want = K.dtw_distance(a, b, window=w)
    if want <= thr:
        assert abs(got - want) < 1e-9 * max(1.0, want)
    else:
        assert got == np.inf or abs(got - want) < 1e-9 * max(1.0, want)


@settings(max_examples=100, deadline=None)
@given(
    series, series,
    st.floats(min_value=0.0, max_value=5.0),
    st.one_of(st.none(), st.floats(min_value=1.0, max_value=100.0)),
    st.integers(1, 8),
    st.integers(0, 3),
)
def test_batched_penalty_maxstep_psi_equal_scalar(a, b, pen, ms, w, psi):
    """Batch kernel == scalar kernel for the full K1 parameter surface
    it exposes (penalty, max_step, psi)."""
    lengths = np.asarray([len(b)], dtype=np.int64)
    M = np.zeros((1, len(b)))
    M[0] = b
    got = K.dtw_distance_batch(
        a, M, lengths, window=w, penalty=pen, max_step=ms, psi=psi
    )[0]
    want = K.dtw_distance(a, b, window=w, penalty=pen, max_step=ms, psi=psi)
    if want == np.inf:
        assert got == np.inf
    else:
        assert abs(got - want) < 1e-9 * max(1.0, want), (got, want)


def test_stride_predicate_matches_python_sampler():
    """The closed-form SQL stride predicate used by dba_rollup /
    encode_blocks / _event_series must select EXACTLY the indexes the
    Python sampler picks — {(j*n)//m : 0 <= j < m} — for every (n, m)
    shape, including n <= m, n = m+1, and n >> m."""
    for n, m in [(1, 4), (4, 4), (5, 4), (7, 3), (16, 4), (1000, 7),
                 (4096, 256), (50, 50), (51, 50), (99, 100)]:
        want = sorted({(j * n) // m for j in range(m)}) if n > m else list(range(n))
        got = [
            i for i in range(n)
            if n <= m or ((i * m + n - 1) // n) * n < (i + 1) * m
        ]
        assert got == want, (n, m)


# -- round-3 kernels ----------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=2, max_size=96))
def test_mk_merge_count_equals_pair_sum(vals):
    """mk_s_stat / mk_tied_pairs == the O(n^2) definitions on heavily
    tied integer series of any length."""
    v = np.asarray(vals, dtype=np.float64)
    n = len(v)
    s = sum(
        int(np.sign(v[j] - v[i]))
        for i in range(n - 1)
        for j in range(i + 1, n)
    )
    t = sum(
        1 for i in range(n - 1) for j in range(i + 1, n) if v[i] == v[j]
    )
    assert K.mk_s_stat(v) == s
    assert K.mk_tied_pairs(v) == t


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=0.02, max_value=0.95),
    st.floats(min_value=-1e3, max_value=1e3),
    st.integers(12, 80),
)
def test_filtfilt_dc_exact_and_bounded(wn, c, n):
    """For ANY cutoff: unity DC gain (constants pass through exactly to
    float precision) and BIBO stability (output bounded by a modest
    multiple of the input range) through the full filtfilt recipe."""
    b, a = K.butter2_lowpass(wn)
    # poles strictly inside the unit circle (stability)
    roots = np.roots(a)
    assert np.all(np.abs(roots) < 1.0 - 1e-12)
    y = K.filtfilt(b, a, np.full(n, c))
    np.testing.assert_allclose(y, c, rtol=1e-9, atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(st.lists(finite, min_size=10, max_size=60))
def test_lfilter_zi_step_steady_state(xs):
    """lfilter with zi scaled by the first sample starts in steady state:
    prepending ANY constant run of the first value changes nothing."""
    x = np.asarray(xs, dtype=np.float64)
    b, a = K.butter2_lowpass(0.3)
    zi = K.lfilter_zi(b, a)
    y1, _ = K.lfilter(b, a, x, zi=zi * x[0])
    ext = np.concatenate([np.full(7, x[0]), x])
    y2, _ = K.lfilter(b, a, ext, zi=zi * x[0])
    np.testing.assert_allclose(y1, y2[7:], rtol=1e-9, atol=1e-9)


# -- round-3 session kernels: BPE merge pass, FLUSS arc curve, SQ8 ----------


@given(
    st.lists(st.integers(0, 5), min_size=2, max_size=60),
    st.integers(0, 5),
    st.integers(0, 5),
)
@settings(max_examples=200, deadline=None)
def test_bpe_merge_once_invariants(seq, a, b):
    from tests.test_bpe import _merge_once

    out, applied = _merge_once(seq, a, b, 99)
    # every application removes exactly one position
    assert len(out) == len(seq) - applied
    # leftmost-non-overlap: NO (a, b) adjacency of ORIGINAL tokens
    # survives the pass (new 99s break any would-be overlap chain)
    for x, y in zip(out, out[1:]):
        assert not (x == a and y == b)
    # non-merged tokens preserved in order
    assert [t for t in out if t != 99] == _strip_merged(seq, a, b)


def _strip_merged(seq, a, b):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


@given(
    st.lists(st.integers(0, 30), min_size=30, max_size=120),
    st.integers(4, 8),
)
@settings(max_examples=50, deadline=None)
def test_fluss_arc_counts_match_naive(vals, m):
    from dtaidistance_spark.operators.matrixprofile import fluss_cac, mp_self

    arr = np.asarray(vals, dtype=np.int64)
    excl, zone = m // 2, m
    res = fluss_cac(arr, m, excl, zone)
    if res is None:
        return
    ac, cac = res
    d2, nn = mp_self(arr, m, excl)
    q = d2.size
    for i in range(q):
        want = sum(
            1
            for p in range(q)
            if nn[p] >= 0 and min(p, nn[p]) < i < max(p, nn[p])
        )
        assert ac[i] == want
    assert (cac >= 0).all() and (cac <= 1).all()


@given(st.lists(st.floats(-100, 100, width=64), min_size=2, max_size=64))
@settings(max_examples=100, deadline=None)
def test_sq8_roundtrip_within_half_step(vals):
    x = np.asarray(vals, dtype=np.float64)
    mn, mx = x.min(), x.max()
    if mx <= mn:
        return
    q = np.floor((x - mn) * 255.0 / (mx - mn) + 0.5)
    xr = mn + q * (mx - mn) / 255.0
    step = (mx - mn) / 255.0
    assert (q >= 0).all() and (q <= 255).all()
    assert (np.abs(x - xr) <= step / 2 + 1e-12 * (mx - mn)).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 80), st.integers(0, 80)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_ares_prefix_property(pairs):
    """A-Res invariant: the top-k by key of a union equals the merge of
    per-partition top-k (the bounded-heap mergeability TakeOrdered
    relies on)."""
    import hashlib
    import math

    keys = {}
    for idx, (w, salt) in enumerate(pairs):
        d = f"doc{idx:04d}"
        h = int(hashlib.md5(f"ares|{d}".encode()).hexdigest()[:13], 16)
        u = (h + 1) / 4503599627370496.0
        keys[d] = -math.log(u) / float(w + 1)
    k = max(1, len(keys) // 3)
    full = sorted(keys, key=lambda d: (keys[d], d))[:k]
    mid = len(pairs) // 2
    part1 = sorted(list(keys)[:mid], key=lambda d: (keys[d], d))[:k]
    part2 = sorted(list(keys)[mid:], key=lambda d: (keys[d], d))[:k]
    merged = sorted(part1 + part2, key=lambda d: (keys[d], d))[:k]
    assert merged == full
