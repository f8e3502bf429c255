"""Gorilla encoding round-trip gates (SURVEY §5.2 gate 2): encode→decode
bit-exact on doubles and int64-µs timestamps; the vectorized encoder and
the full-spec reference encoder must both decode exactly."""

import numpy as np
import pytest

from dtaidistance_spark.encoding import gorilla as G


def _cases():
    rng = np.random.default_rng(7)
    cases = []
    for n in (1, 2, 3, 100, 4096):
        ts = np.cumsum(rng.integers(1, 100, n)).astype(np.int64) * 1_000_000
        vals = np.round(np.cumsum(rng.normal(0, 1, n)), 2)
        cases.append((f"walk{n}", ts, vals))
    cases.append(
        ("const", np.arange(50, dtype=np.int64) * 60_000_000, np.full(50, 3.14))
    )
    cases.append(
        (
            "weird_floats",
            np.array([0, 10**15, 2 * 10**15 + 7], dtype=np.int64),
            np.array([np.inf, -0.0, np.nan]),
        )
    )
    # dod hits every timestamp bucket: 0 / 7b / 9b / 12b / 64b escape
    ts = np.array([0, 1, 2, 70, 80, 400, 420, 3000, 3100, 10**10], dtype=np.int64)
    cases.append(("buckets", ts, rng.normal(0, 1, len(ts))))
    # raw random mantissas (worst case for XOR)
    cases.append(
        ("random", np.sort(rng.integers(0, 10**12, 500)).astype(np.int64),
         rng.normal(0, 1e9, 500))
    )
    return cases


@pytest.mark.parametrize("name,ts,vals", _cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_block_roundtrip_bit_exact(name, ts, vals):
    blk = G.encode_block(ts, vals)
    ts2, v2 = G.decode_block(blk)
    assert np.array_equal(ts, ts2)
    assert np.array_equal(
        np.asarray(vals, dtype=np.float64).view(np.uint64), v2.view(np.uint64)
    )


@pytest.mark.parametrize("name,ts,vals", _cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_decoder_handles_full_spec_encoder(name, ts, vals):
    """The reference encoder uses the paper's '10' reuse-window branch;
    the decoder must handle it identically."""
    vals = np.asarray(vals, dtype=np.float64)
    ref = G.encode_values_ref(vals)
    out = G.decode_values(ref, float(vals[0]), len(vals))
    assert np.array_equal(vals.view(np.uint64), out.view(np.uint64))


def test_smooth_series_compresses():
    ts = np.arange(10_000, dtype=np.int64) * 1_000_000  # regular 1s grid
    vals = np.full(10_000, 42.5)
    blk = G.encode_block(ts, vals)
    enc = len(blk["ts_block"]) + len(blk["val_block"]) + 20
    assert enc * 10 < 16 * 10_000  # >10x on constant series


def test_tier_encoding_roundtrip(spark):
    """North-rule loop closed: rollup tier -> Gorilla blocks -> decode
    == the tier's own point stream, bit-exact values and timestamps;
    the regular grid packs timestamps near the 1-bit/point floor."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.encoding import blocks as B
    from dtaidistance_spark.operators import rollup as R

    seq = synth.sequences_df(spark, 256)
    rolled = R.dba_rollup(seq, tier="1 hour").persist()
    want = sorted(
        (r.key, r.ts, r.value)
        for r in B.tier_points(rolled, 3600).collect()
    )
    blocks = B.encode_tier(rolled, 3600, block_window="1 day").persist()
    got = sorted(
        (r.key, r.ts, r.value)
        for r in B.decode_blocks(blocks, key_cols=["key", "block_start"])
        .select("key", "ts", "value").collect()
    )
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert np.float64(g[2]).view(np.int64) == np.float64(w[2]).view(np.int64)
    # regular grid => delta-of-delta ~1 bit/point after the first two
    stats = B.compression_stats(blocks, ["key"]).collect()
    assert all(r.ratio > 1.5 for r in stats), [r.ratio for r in stats]
    rolled.unpersist()
    blocks.unpersist()


def test_block_chunking_bounds_buffer(spark):
    """max_points_per_block splits a hot (key, day) into time-contiguous
    bounded blocks: counts per block <= cap, block count = ceil(n/cap),
    decoded point union identical to the unchunked encoding."""
    from dtaidistance_spark.encoding import blocks as B

    pts = spark.range(1000).selectExpr(
        "'k' AS key",
        "timestamp_micros(cast(1767225600000000 + id * 1000000 AS long)) AS ts",
        "cast(id % 17 AS double) / 7 AS value",
    )
    blocks = B.encode_blocks(
        pts, key_cols=["key"], block_window="1 day", max_points_per_block=50
    ).persist()
    rows = blocks.collect()
    assert len(rows) == 20  # ceil(1000 / 50)
    assert all(r["count"] <= 50 for r in rows)
    assert sorted(r["block_seq"] for r in rows) == list(range(20))
    decoded = sorted(
        (r["ts"], r["value"])
        for r in B.decode_blocks(blocks, key_cols=["key"]).collect()
    )
    orig = sorted((r["ts"], r["value"]) for r in pts.collect())
    assert decoded == orig
    blocks.unpersist()
