"""Semantic gates for xcorr_q: a numpy reference recomputes the full
exact cross-covariance table and the best-lag verdicts from the raw
events parquet."""

import math

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.operators.xcorr_q import _L, xcorr_best_lag, xcorr_lags


@pytest.fixture(scope="module")
def dense(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    h = (ev.ts.astype("int64") // 1_000_000 // 3600).to_numpy()
    lo, hi = h.min(), h.max()
    n = int(hi - lo + 1)
    out = {}
    for t, grp in ev.groupby("event_type"):
        hh = grp.ts.astype("int64").to_numpy() // 1_000_000 // 3600 - lo
        out[t] = np.bincount(hh, minlength=n).astype(np.int64)
    return out, n


def _stats(xa, xb, k):
    n = len(xa)
    a0, b0, m = max(0, -k), max(0, k), n - abs(k)
    x, y = xa[a0 : a0 + m], xb[b0 : b0 + m]
    return (
        m,
        int(x @ y),
        int(x.sum()),
        int(y.sum()),
        int(x @ x),
        int(y @ y),
    )


def test_lag_table_matches_numpy(spark, sf_dir, dense):
    arr, n = dense
    out = xcorr_lags(spark, sf_dir).toPandas().set_index(["ta", "tb", "k"])
    types = sorted(arr)
    npairs = len(types) * (len(types) - 1) // 2
    assert len(out) == npairs * (2 * _L + 1)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            for k in range(-_L, _L + 1):
                m, sxy, sx, sy, sxx, syy = _stats(arr[ta], arr[tb], k)
                got = out.loc[(ta, tb, k)]
                assert got.m == m and got.sxy == sxy
                assert got.sx == sx and got.sy == sy
                assert got.sxx == sxx and got.syy == syy
                assert got.c == m * sxy - sx * sy, (ta, tb, k)


def test_best_lag_matches_numpy(spark, sf_dir, dense):
    arr, n = dense
    out = xcorr_best_lag(spark, sf_dir).toPandas().set_index(["ta", "tb"])
    types = sorted(arr)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            best = None
            for k in range(-_L, _L + 1):
                m, sxy, sx, sy, sxx, syy = _stats(arr[ta], arr[tb], k)
                c = m * sxy - sx * sy
                vx, vy = m * sxx - sx * sx, m * syy - sy * sy
                # argmax c, ties to smallest k (scan order handles it)
                if best is None or c > best[0]:
                    best = (c, k, m, vx, vy)
            c, k, m, vx, vy = best
            got = out.loc[(ta, tb)]
            assert got.best_k == k and got.c == c and got.m == m
            r = 0.0 if vx * vy == 0 else math.floor(
                c / math.sqrt(float(vx) * float(vy)) * 1e6 + 0.5
            ) / 1e6
            assert got.r == r, (ta, tb)


def test_series_acf_matches_numpy(spark, sf_dir):
    """TS28: exact per-lag statistics and the dominant-lag verdict
    recompute from numpy (raw modular-ramp tokens decorrelate, so
    the gate is exactness + verdict determinism, not a planted period)."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.xcorr_q import (
        _ACF_LAGS,
        _ACF_N,
        series_acf,
    )

    out = series_acf(spark, sf_dir).toPandas().set_index(["doc_id", "k"])
    loc = synth.sequences_local(_ACF_N)
    assert len(out) == _ACF_N * len(_ACF_LAGS)
    for row in loc.itertuples():
        x = row.tokens.astype(np.int64)
        n = len(x)
        best = None
        for k in _ACF_LAGS:
            m = n - k
            hd, tl = x[:m], x[k : k + m]
            sxy, sh, st = int(hd @ tl), int(hd.sum()), int(tl.sum())
            shh, stt = int(hd @ hd), int(tl @ tl)
            c = m * sxy - sh * st
            vh, vt = m * shh - sh * sh, m * stt - st * st
            r = (
                0.0
                if vh == 0 or vt == 0
                else math.floor(
                    c / math.sqrt(float(vh) * float(vt)) * 1e6 + 0.5
                )
                / 1e6
            )
            got = out.loc[(row.doc_id, k)]
            assert got.m == m and got.c == c
            assert got.vh == vh and got.vt == vt
            assert got.r == r, (row.doc_id, k)
            if best is None or r > best[0]:
                best = (r, k)
        dom = out.loc[row.doc_id]
        assert dom[dom.is_dominant].index.tolist() == [best[1]], row.doc_id


def test_paa_fidelity_matches_numpy(spark, sf_dir):
    """TS29: exact w-scaled SSE + variance-retained ratio recompute."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.tswin_q import _PAA_WS, paa_fidelity
    from dtaidistance_spark.operators.tswin_q import _N as _PN

    out = paa_fidelity(spark, sf_dir).toPandas().set_index(["doc_id", "w"])
    loc = synth.sequences_local(_PN)
    assert len(out) == _PN * len(_PAA_WS)
    for row in loc.itertuples():
        x = row.tokens.astype(np.int64)
        for w in _PAA_WS:
            nb = len(x) // w
            cov = x[: nb * w]
            bs = cov.reshape(nb, w).sum(axis=1)
            res = w * cov - np.repeat(bs, w)
            sse = int((res * res).sum())
            mm, sxx, sx = nb * w, int(cov @ cov), int(cov.sum())
            got = out.loc[(row.doc_id, w)]
            assert got.n_blocks == nb and got.m_covered == mm
            assert got.sse_num == sse
            assert got.sxx == sxx and got.sx == sx
            den = mm * sxx - sx * sx
            ratio = (
                0.0
                if den == 0
                else math.floor(
                    (1.0 - (sse / (float(w) * float(w))) / (
                        (float(mm) * float(sxx) - float(sx) * float(sx))
                        / float(mm)
                    ))
                    * 1e6
                    + 0.5
                )
                / 1e6
            )
            assert got.var_retained == ratio, (row.doc_id, w)
    # fidelity is monotone in tier width on average: wider blocks
    # discard more variance
    mean_by_w = out.groupby(level="w").var_retained.mean()
    assert mean_by_w[4] > mean_by_w[16] > mean_by_w[64]


def test_rolling_correlation_matches_pandas(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from dtaidistance_spark.operators.xcorr_q import rolling_correlation

    out = (
        rolling_correlation(spark, sf_dir)
        .toPandas()
        .set_index("window_end_h")
        .sort_index()
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["h"] = ev["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
    piv = (
        ev[ev.event_type.isin(["click", "view"])]
        .pivot_table(index="h", columns="event_type", values="event_id",
                     aggfunc="count")
        .reindex(range(ev.h.min(), ev.h.max() + 1))
        .fillna(0)
    )
    roll = piv["click"].rolling(24).corr(piv["view"])
    n_checked = 0
    for w, r in out["r"].items():
        want = roll.loc[w]
        assert abs(r - want) < 1e-4, w
        n_checked += 1
    assert n_checked > 600
    # counts telescoping: window sums equal pandas rolling sums
    rs = piv["click"].rolling(24).sum()
    assert all(out.loc[w, "sx"] == rs.loc[w] for w in out.index[:50])
