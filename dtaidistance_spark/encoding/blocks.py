"""Spark operators for Gorilla-encoded retention-tier blocks (E3).

Scale shape: ONE hash shuffle on the block key; member sort happens
JVM-side (``array_sort(collect_list(struct(ts, val)))``) so rows cross
the Arrow boundary exactly once, already grouped and ordered, and the
vectorized numpy bit-packer runs per block — no per-row Python
(north rule). Each (key, block_window) is one block, so block size is
bounded regardless of total table size and blocks parallelize across
executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dtaidistance_spark.encoding import gorilla as G


def encode_blocks(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    val_col: str = "value",
    block_window: str | None = "1 day",
    max_points_per_block: int | None = 4096,
) -> DataFrame:
    """Encode (ts, value) points into Gorilla blocks per
    (key_cols..., block_start, block_seq). ``ts_col`` may be a timestamp
    (encoded at µs resolution) or an integral epoch column.

    ``max_points_per_block`` caps block size the way real TSDBs do
    (Gorilla's paper uses 2h blocks, Influx ~1000 points): a window
    rank in time order assigns ``block_seq = rank div cap``, so a
    pathological hot (key, window) with millions of points becomes many
    bounded blocks instead of one unbounded JVM collect_list buffer —
    the same pre-aggregation bound the DBA rollup uses. Chunks stay
    time-contiguous, so delta-of-delta efficiency is unchanged; decode
    is oblivious (each block row decodes independently and the point
    union is identical). ``None`` disables the cap."""
    ts_expr = F.col(ts_col)
    # session TZ is UTC, so TIMESTAMP_NTZ -> TIMESTAMP is the identity map
    ts_us = (
        F.unix_micros(ts_expr.cast("timestamp"))
        if dict(df.dtypes)[ts_col] in ("timestamp", "timestamp_ntz")
        else ts_expr.cast("long")
    )
    keyed = df.select(
        *[F.col(k) for k in key_cols],
        ts_us.alias("_ts_us"),
        F.col(val_col).cast("double").alias("_val"),
    )
    group = list(key_cols)
    if block_window is not None:
        keyed = keyed.withColumn(
            "block_start",
            F.window(F.timestamp_micros(F.col("_ts_us")), block_window)["start"],
        )
        group = group + ["block_start"]
    if max_points_per_block is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*group).orderBy("_ts_us", "_val")
        keyed = keyed.withColumn(
            "block_seq",
            ((F.row_number().over(w) - 1) / max_points_per_block).cast("int"),
        )
        group = group + ["block_seq"]
    # sort JVM-side, then split the struct array into two primitive
    # arrays (array<long>, array<double>) so the Arrow transfer hands
    # the kernel numpy-ready buffers — no per-point Python conversion
    grouped = keyed.groupBy(*group).agg(
        F.array_sort(F.collect_list(F.struct("_ts_us", "_val"))).alias("_pts")
    ).select(
        *group,
        F.col("_pts._ts_us").alias("_ts"),
        F.col("_pts._val").alias("_vals"),
    )

    key_fields = [f"{k} {t}" for k, t in df.select(*key_cols).dtypes]
    if block_window is not None:
        key_fields.append("block_start timestamp")
    if max_points_per_block is not None:
        key_fields.append("block_seq int")
    out_schema = ", ".join(
        key_fields
        + [
            "count long",
            "first_ts long",
            "first_val double",
            "ts_block binary",
            "val_block binary",
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            cols = [pdf[k] for k in group]
            for i, (ts_arr, val_arr) in enumerate(zip(pdf["_ts"], pdf["_vals"])):
                blk = G.encode_block(
                    np.asarray(ts_arr, dtype=np.int64),
                    np.asarray(val_arr, dtype=np.float64),
                )
                for k, c in zip(group, cols):
                    blk[k] = c.iloc[i]
                rows.append(blk)
            yield pd.DataFrame(rows)

    return grouped.mapInPandas(kernel, out_schema)


def decode_blocks(df: DataFrame, key_cols: list[str], ts_as_timestamp: bool = True) -> DataFrame:
    """Decode Gorilla blocks back to (key_cols..., ts, value) points.

    Note: NaN values come back as NULL — the bitstream preserves the NaN
    bit pattern exactly (see kernel round-trip tests), but the
    pandas→Arrow boundary of ``mapInPandas`` maps NaN to null, matching
    the usual TSDB convention that NaN is a missing point."""
    key_fields = [f"{k} {t}" for k, t in df.select(*key_cols).dtypes]
    out_schema = ", ".join(key_fields + ["ts_us long", "value double"])

    def kernel(batches):
        for pdf in batches:
            ts_list, val_list, counts = [], [], np.zeros(len(pdf), dtype=np.int64)
            it = zip(
                pdf["count"], pdf["first_ts"], pdf["first_val"],
                pdf["ts_block"], pdf["val_block"],
            )
            for i, (cnt, fts, fval, tsb, valb) in enumerate(it):
                ts, vals = G.decode_block(
                    {
                        "count": cnt,
                        "first_ts": fts,
                        "first_val": fval,
                        "ts_block": bytes(tsb or b""),
                        "val_block": bytes(valb or b""),
                    }
                )
                ts_list.append(ts)
                val_list.append(vals)
                counts[i] = len(ts)
            cols = {
                k: np.repeat(pdf[k].to_numpy(), counts) for k in key_cols
            }
            cols["ts_us"] = (
                np.concatenate(ts_list) if ts_list else np.empty(0, np.int64)
            )
            cols["value"] = (
                np.concatenate(val_list) if val_list else np.empty(0, np.float64)
            )
            yield pd.DataFrame(cols)

    out = df.mapInPandas(kernel, out_schema)
    if ts_as_timestamp:
        out = out.select(
            *key_cols,
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "value",
        )
    return out


def compression_stats(blocks: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key compression metrics for the encoded blocks table."""
    return (
        blocks.groupBy(*key_cols)
        .agg(
            F.sum("count").alias("n_points"),
            F.count(F.lit(1)).alias("n_blocks"),
            (F.sum("count") * 16).alias("raw_bytes"),
            F.sum(
                F.length("ts_block") + F.length("val_block") + F.lit(20)
            ).alias("enc_bytes"),
        )
        .withColumn(
            "ratio", F.round(F.col("raw_bytes") / F.col("enc_bytes"), 3)
        )
    )


def tier_points(
    rolled: DataFrame, tier_seconds: int, barycenter_col: str = "barycenter"
) -> DataFrame:
    """Flatten a rollup tier to (key, ts, value) points: barycenter
    position i of a window maps to ``window_start + i * (tier /
    len(barycenter))`` — the tier's native point stream, pure SQL."""
    n = F.size(barycenter_col)
    step_us = (F.lit(int(tier_seconds) * 1_000_000).cast("long") / n).cast("long")
    return (
        rolled.select(
            "key",
            F.unix_micros(F.col("window_start").cast("timestamp")).alias("_w0"),
            step_us.alias("_dt"),
            F.posexplode(barycenter_col).alias("_pos", "value"),
        )
        .select(
            "key",
            F.timestamp_micros(
                F.col("_w0") + F.col("_pos") * F.col("_dt")
            ).alias("ts"),
            "value",
        )
    )


def encode_tier(
    rolled: DataFrame, tier_seconds: int, block_window: str = "1 day",
    barycenter_col: str = "barycenter",
) -> DataFrame:
    """Gorilla-encode a retention tier (the north rule's "Gorilla XOR +
    delta-of-delta for each retention tier"): the tier's barycenter
    points become per-(key, block) bitstreams. Timestamps are the
    regular within-window grid, so delta-of-delta packs them at ~1-2
    bits/point; decode_blocks restores the exact points (gated
    bit-exact in tests)."""
    pts = tier_points(rolled, tier_seconds, barycenter_col)
    return encode_blocks(
        pts, key_cols=["key"], ts_col="ts", val_col="value",
        block_window=block_window,
    )
