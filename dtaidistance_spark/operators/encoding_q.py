"""Registry queries for Gorilla-encoded tier blocks (SURVEY §2.9).

``gorilla_roundtrip`` is the strongest oracle an encoder can have: the
Spark plan encodes every (event_type, day) point stream into Gorilla
bitstreams, decodes them back, and returns the points — the DuckDB
oracle is simply ``SELECT ... FROM events``, so a single flipped bit
anywhere in 10k (ts, value) pairs fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.encoding import blocks as B
from dtaidistance_spark.operators.queries import T, register


@register(
    "gorilla_roundtrip",
    oracle="""
    SELECT event_type, ts, round(value, 4) AS value
    FROM events
    """,
)
def gorilla_roundtrip(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    blocks = B.encode_blocks(
        ev, key_cols=["event_type"], ts_col="ts", val_col="value",
        block_window="1 day",
    )
    pts = B.decode_blocks(blocks, key_cols=["event_type", "block_start"])
    return pts.select(
        "event_type", "ts", F.round("value", 4).alias("value")
    )


@register(
    "gorilla_block_meta",
    oracle="""
    WITH pts AS (
        SELECT event_type, date_trunc('day', ts) AS bs, ts, value FROM events
    ), agg AS (
        SELECT event_type, bs, count(*) AS n_points, min(ts) AS mts
        FROM pts GROUP BY 1, 2
    )
    SELECT a.event_type, a.bs::TIMESTAMP AS block_start, a.n_points,
           a.mts::TIMESTAMP AS first_ts,
           round(min(p.value), 4) AS first_val
    FROM agg a
    JOIN pts p ON p.event_type = a.event_type AND p.bs = a.bs AND p.ts = a.mts
    GROUP BY 1, 2, 3, 4
    """,
)
def gorilla_block_meta(spark, sf_dir):
    """Driver-checkable projection of the tier block layout (E3): every
    block's point count, start window, first timestamp and first value
    must equal plain SQL over events — the header bookkeeping the
    encoder writes (the payload bitstreams are covered bit-exactly by
    gorilla_roundtrip's decode oracle). Ties on first_ts take the min
    value, matching the encoder's (ts, value) struct sort. Chunked
    block_seq rows (max_points_per_block) aggregate back to one row per
    (key, window): counts sum, the first chunk carries the first point."""
    ev = T(spark, sf_dir, "events")
    blocks = B.encode_blocks(
        ev, key_cols=["event_type"], ts_col="ts", val_col="value",
        block_window="1 day",
    )
    return blocks.groupBy("event_type", "block_start").agg(
        F.sum("count").alias("n_points"),
        F.timestamp_micros(F.min("first_ts")).alias("first_ts"),
        F.round(F.min_by("first_val", "block_seq"), 4).alias("first_val"),
    )


@register("gorilla_compression")
def gorilla_compression(spark, sf_dir):
    """Per-event-type compression ratio of the encoded tier blocks
    (rows-only: byte counts aren't SQL-expressible)."""
    ev = T(spark, sf_dir, "events")
    blocks = B.encode_blocks(
        ev, key_cols=["event_type"], ts_col="ts", val_col="value",
        block_window="1 day",
    )
    return B.compression_stats(blocks, key_cols=["event_type"]).orderBy(
        "event_type"
    )


@register("gorilla_tier_blocks")
def gorilla_tier_blocks(spark, sf_dir):
    """North-rule loop: rollup tier -> Gorilla blocks per (key, day)
    with compression stats (rows-only; the bit-exact decode==tier gate
    lives in test_gorilla)."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators import rollup as R

    seq = synth.sequences_df(spark, 512)
    rolled = R.dba_rollup(seq, tier="1 hour")
    blocks = B.encode_tier(rolled, 3600, block_window="1 day")
    return B.compression_stats(blocks, key_cols=["key"]).orderBy("key")


@register(
    "gorilla_compression_check",
    oracle="""
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, sum(c)::BIGINT AS n_points,
           sum(ceil(c / 4096.0))::BIGINT AS n_blocks,
           (16 * sum(c))::BIGINT AS raw_bytes, true AS bounded
    FROM d GROUP BY 1
    """,
)
def gorilla_compression_check(spark, sf_dir):
    """Driver-checkable projection of the compression stats: point,
    block, and raw-byte accounting recomputed by SQL, plus the format's
    worst-case size invariant — per point at most ~145 bits (ts
    delta-of-delta 64-bit escape + value XOR full-mantissa path), so
    enc_bytes <= 21*n_points + 40*n_blocks always holds or the encoder
    is emitting garbage. (Raw random event values at tiny block sizes
    legitimately do NOT compress below raw — the compression WIN is
    measured on the regular tier streams in gorilla_tier_blocks, ~2x —
    so the oracle asserts the ceiling, which is data-independent.)"""
    ev = T(spark, sf_dir, "events")
    blocks = B.encode_blocks(
        ev, key_cols=["event_type"], ts_col="ts", val_col="value",
        block_window="1 day",
    )
    stats = B.compression_stats(blocks, key_cols=["event_type"])
    return stats.select(
        "event_type",
        "n_points",
        "n_blocks",
        "raw_bytes",
        (
            F.col("enc_bytes")
            <= F.lit(21) * F.col("n_points") + F.lit(40) * F.col("n_blocks")
        ).alias("bounded"),
    )
