"""T36b gates — Heaps'-law fit (operators/heaps_q.py):

1. numpy parity: the production fit (through Spark, order-pinned
   folds) matches an independent numpy lstsq on the same exact
   integer curve to ≤ 2e-6 (one floor-1e6 grain) per source;
2. pure-power-law control: a constructed curve V = round(K·N^β)
   recovers its planted β to the rounding limit with r² ≈ 1 — the
   fit machinery is unbiased, so the corpus' bent tail (web
   r² = 0.768) is the data, not the estimator;
3. the measured corpus pins: the three sources sit at three points
   of one saturation trajectory (β falls as token mass grows; web's
   vocabulary is the ENTIRE 50 257 token space);
4. curve exactness: the int64 (N_k, V_k) checkpoints equal a pure
   Python first-occurrence replay of the corpus.
"""

from __future__ import annotations

import numpy as np
import pytest

from dtaidistance_spark import synth


def _local_curve():
    """Pure-Python first-occurrence replay: per source, (i, N_k, V_k)
    in doc-index order."""
    pdf = synth.sequences_local(512)
    curves = {}
    for src in sorted(pdf["source"].unique()):
        sub = pdf[pdf["source"] == src].copy()
        sub["i"] = sub["doc_id"].str[3:].astype(int)
        sub = sub.sort_values("i")
        seen, nk, rows = set(), 0, []
        for _, r in sub.iterrows():
            toks = list(r["tokens"])
            nk += len(toks)
            seen.update(int(t) for t in toks)
            rows.append((int(r["i"]), nk, len(seen)))
        curves[src] = rows
    return curves


def _numpy_fit(rows):
    x = np.log([n for _, n, _ in rows])
    y = np.log([v for _, _, v in rows])
    A = np.stack([x, np.ones_like(x)], axis=1)
    (beta, lnk), *_ = np.linalg.lstsq(A, y, rcond=None)
    r = np.corrcoef(x, y)[0, 1]
    return beta, float(np.exp(lnk)), float(r * r)


def test_fit_matches_numpy_and_pins(spark, sf_dir):
    from dtaidistance_spark.operators.heaps_q import heaps_law_fit

    got = {r["source"]: r for r in heaps_law_fit(spark, sf_dir).collect()}
    curves = _local_curve()
    assert set(got) == set(curves)
    for src, rows in curves.items():
        g = got[src]
        assert g["n_checkpoints"] == len(rows)
        assert g["n_tokens"] == rows[-1][1]
        assert g["vocab"] == rows[-1][2]
        beta, k, r2 = _numpy_fit(rows)
        assert abs(g["beta"] - beta) <= 2e-6
        assert abs(g["k_coeff"] - k) <= max(2e-6, 1e-6 * k)
        assert abs(g["r2"] - r2) <= 2e-6
    # the measured saturation trajectory (module header): β falls as
    # token mass grows, and web exhausts the whole token space
    assert got["books"]["beta"] == pytest.approx(0.946601, abs=1e-6)
    assert got["code"]["beta"] == pytest.approx(0.752479, abs=1e-6)
    assert got["web"]["beta"] == pytest.approx(0.363902, abs=1e-6)
    assert got["web"]["vocab"] == 50257
    assert (
        got["books"]["beta"] > got["code"]["beta"] > got["web"]["beta"]
    )
    assert got["books"]["r2"] > 0.999


def test_pure_power_law_recovers_beta(spark):
    """A constructed V = round(K·N^β) curve recovers β/K with
    r² ≈ 1 through the exact production fit layer."""
    from dtaidistance_spark.operators.heaps_q import _fit_from_curve

    K0, B0 = 3.5, 0.62
    rows = []
    n = 0
    for i in range(1, 121):
        n += 500 + 7 * i
        rows.append(("ctl", i, n, int(round(K0 * n**B0))))
    curve = spark.createDataFrame(
        rows, "source string, i long, nk long, vk long"
    )
    g = _fit_from_curve(curve).collect()[0]
    assert g["beta"] == pytest.approx(B0, abs=2e-4)  # integer-round grain
    assert g["k_coeff"] == pytest.approx(K0, rel=3e-3)
    assert g["r2"] > 0.999999
