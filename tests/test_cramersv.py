"""Semantic gates for cramersv_q (T75): pandas recompute of expected
counts, adjusted residuals, and V; consistency with T68's chi2; and
the small-effect honest reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.cramersv_q import (
    _MIN_DF,
    cramers_v_residuals,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_pandas(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day_part"] = ev.ts.dt.hour // 6
    tab = ev.groupby(["event_type", "day_part"]).size().unstack(fill_value=0)
    o = tab.to_numpy(dtype=float)
    r = o.sum(axis=1, keepdims=True)
    c = o.sum(axis=0, keepdims=True)
    n = o.sum()
    e = r @ c / n
    chi2 = float(((o - e) ** 2 / e).sum())
    v = math.sqrt(chi2 / (n * _MIN_DF))
    d = (o - e) / np.sqrt(e * (1 - r / n) * (1 - c / n))
    out = cramers_v_residuals(spark, sf_dir).toPandas()
    assert len(out) == o.size
    idx = {t: i for i, t in enumerate(tab.index)}
    n_sig = 0
    signs = set()
    for row in out.itertuples():
        i, j = idx[row.event_type], int(row.day_part)
        assert row.o == int(o[i, j])
        assert abs(row.expected - f6(e[i, j])) < 1e-5
        assert abs(row.adj_residual - f6(d[i, j])) < 1e-4
        assert row.cell_sig == (1 if abs(d[i, j]) > 1.96 else 0)
        # V identical on every row (table-level, order-pinned fold)
        assert abs(row.cramers_v - v) < 1e-5
        n_sig += int(row.cell_sig)
        if row.cell_sig:
            signs.add(d[i, j] > 0)
    # honest reading: T68 rejects, and V grades it a SMALL effect with
    # a minority of individually-significant cells in both directions
    assert 0.02 < v < 0.25
    assert 0 < n_sig < o.size
    assert len(signs) >= 1  # at sf0.001 only one direction crosses


def test_hand_case():
    # 2x2 with a known V: o = [[30,10],[10,30]] → chi2 = 20, n = 80,
    # V = sqrt(20/80) = 0.5
    o = np.array([[30.0, 10.0], [10.0, 30.0]])
    r = o.sum(1, keepdims=True)
    c = o.sum(0, keepdims=True)
    n = o.sum()
    e = r @ c / n
    chi2 = ((o - e) ** 2 / e).sum()
    assert abs(chi2 - 20.0) < 1e-12
    assert abs(math.sqrt(chi2 / (n * 1)) - 0.5) < 1e-12
    # adjusted residuals all equal magnitude on the balanced table
    d = (o - e) / np.sqrt(e * (1 - r / n) * (1 - c / n))
    assert abs(abs(d).max() - abs(d).min()) < 1e-12
