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
