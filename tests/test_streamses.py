"""Semantic gates for streamses_q (R51, the 10th stateful op):
pure-python recompute of every drained row from the raw parquet
(sorted exactly as the kernel sorts), and MASE consistency."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.streamses_q import stream_ses_level

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_drained_rows_match_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = stream_ses_level(spark, sf_dir).toPandas().set_index("event_type")
    types = sorted(ev.event_type.unique())
    assert sorted(out.index) == [
        t for t in types if (ev.event_type == t).sum() >= 3
    ]
    for et in out.index:
        g = ev[ev.event_type == et].sort_values(["ts", "event_id"])
        x = (g.value * 100).apply(lambda v: math.floor(v + 0.5)).astype(
            "int64"
        )
        xs = x.to_numpy()
        l = float(xs[0])
        sse = sae = 0.0
        for t in range(1, len(xs)):
            y = float(xs[t])
            e = y - l
            sse += e * e
            sae += abs(e)
            l = 0.2 * y + 0.8 * l
        sad = int(np.abs(np.diff(xs).astype(object)).sum())
        r = out.loc[et]
        assert r.n_events == len(xs)
        assert r.sad == sad
        assert abs(r.ses_sse - f6(sse)) < max(1e-6, 1e-11 * sse)
        assert abs(r.ses_sae - f6(sae)) < max(1e-6, 1e-11 * sae)
        assert abs(r.final_level - f6(l)) < 1e-6
        if sad > 0:
            assert abs(r.mase - f6(sae / sad)) < 1e-6
