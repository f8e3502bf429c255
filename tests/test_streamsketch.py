"""Semantic gates for streamsketch_q (R38): the emitted sketch rows
equal the batch construction, the Python bucket index mirrors the SQL
spelling exactly, and the sketch state stays bounded."""

import pandas as pd
import pytest

from dtaidistance_spark.operators.streamsketch_q import stream_uddq_sketch


def _idx_py(v: int) -> int:
    if v < 8:
        return v
    L = v.bit_length()
    return (L - 1) * 8 + ((v >> (L - 4)) & 7)


def test_python_index_mirrors_sql(spark):
    """The kernel's bit_length index == the T32 SQL length(bin())
    spelling on an exhaustive small range + decade probes."""
    vals = list(range(0, 4096)) + [10**k for k in range(2, 12)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "t long"
    ).selectExpr(
        "t",
        "CASE WHEN t < 8 THEN t ELSE (length(bin(CAST(t AS BIGINT))) - 1)"
        " * 8 + (shiftright(t, length(bin(CAST(t AS BIGINT))) - 4) & 7)"
        " END AS idx",
    )
    for r in df.collect():
        assert r.idx == _idx_py(r.t), r.t


def test_stream_equals_batch_sketch(spark, sf_dir):
    """Emitted (type, idx, cnt) rows == the batch GROUP BY over the
    same cents/index pipeline — the order-free-merge property."""
    out = stream_uddq_sketch(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.value > 0.0]
    cents = (100.0 * ev.value + 0.5).apply(int)  # 2-dp exact
    idx = cents.apply(_idx_py)
    want = (
        pd.DataFrame({"event_type": ev.event_type, "idx": idx})
        .groupby(["event_type", "idx"])
        .size()
        .reset_index(name="cnt")
    )
    got = out[["event_type", "idx", "cnt"]].sort_values(
        ["event_type", "idx"]
    ).reset_index(drop=True)
    want = want.sort_values(["event_type", "idx"]).reset_index(drop=True)
    assert got.equals(want.astype({"cnt": "int64", "idx": "int64"}))


def test_bucket_edges_contain_bucket(spark, sf_dir):
    """Every emitted bucket satisfies lo ≤ est ≤ hi and the bucket
    count is positive — and the sketch is SMALL (bounded buckets per
    type) even though the stream had thousands of events."""
    out = stream_uddq_sketch(spark, sf_dir).toPandas()
    assert (out["lo"] <= out["est"]).all()
    assert (out["est"] <= out["hi"]).all()
    assert (out["cnt"] > 0).all()
    per_type = out.groupby("event_type").size()
    assert (per_type < 512).all()
    assert out["cnt"].sum() > per_type.sum()  # real compression


def test_stream_kmv_matches_python(spark, sf_dir):
    """R43: the drained KMV rows recompute exactly from a pure-Python
    bottom-k over the md5 hashes, and the estimate lands within the
    1/sqrt(k) error band of the true distinct count."""
    import hashlib
    import math

    import pandas as pd

    from dtaidistance_spark.operators.streamsketch_q import (
        _KMV_K,
        _TWO60,
        stream_kmv_distinct,
    )

    out = (
        stream_kmv_distinct(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["cents"] = (100.0 * ev.value + 0.5).apply(math.floor).astype(int)
    n_checked = 0
    for et, grp in ev.groupby("event_type"):
        hs = sorted(
            {
                int(hashlib.md5(str(c).encode()).hexdigest()[:15], 16)
                for c in grp.cents
            }
        )
        nd = len(hs)
        got = out.loc[et]
        kept = min(nd, _KMV_K)
        assert got.k_kept == kept
        assert got.theta == hs[kept - 1]
        est = (
            float(nd)
            if nd < _KMV_K
            else (_KMV_K - 1.0) * float(_TWO60) / float(hs[_KMV_K - 1])
        )
        assert abs(got.kmv_estimate - math.floor(est * 1e6 + 0.5) / 1e6) < 1e-9
        # accuracy: within 5/sqrt(k) of truth (wide band, deterministic)
        assert abs(est - nd) < 5.0 * nd / math.sqrt(_KMV_K)
        n_checked += 1
    assert n_checked == len(out) == 5
