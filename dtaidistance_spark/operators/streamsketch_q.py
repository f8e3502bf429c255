"""R38 — streaming quantile-sketch maintenance
(``streaming/continuous.stream_uddq_sketch``, the 7th
applyInPandasWithState operator): T32's UddSketch-analog log-bucket
histogram maintained incrementally per event type as the stream
arrives, state = the sketch itself (bounded by touched buckets, NOT
by stream length).  Because bucket counts are order-free int64 sums,
the emitted rows are bit-equal to the batch GROUP BY however the
stream is micro-batched — so this stateful operator is FULLY oracled
(where the CUSUM/OHLC kernels settle for rows-only + oracle twins).

The registry query replays the events table file-by-file
(maxFilesPerTrigger=1 → genuine cross-batch state merges), flushes
with the far-future closer row, and projects each emitted bucket with
T32's exact integer edges (lo, hi, midpoint estimate) — every column
int64 or string.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.qutil import detach
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.sketch_q import (
    _UDQ_IDX_DUCK,
    _udq_edges,
)

import re as _re

_CENTS_DUCK = "CAST(floor(100.0 * value + 0.5) AS BIGINT)"
# rename the T32 index expression's value variable t -> t0 (word
# boundaries, so bin/bit names are untouched)
_IDX_DUCK = _re.sub(r"\bt\b", "t0", _UDQ_IDX_DUCK)


@register(
    "stream_uddq_sketch",
    oracle=f"""
    WITH c AS (
      SELECT event_type, {_CENTS_DUCK} AS t0
      FROM events WHERE value > 0.0
    ),
    bk AS (
      SELECT event_type, {_IDX_DUCK} AS idx,
             CAST(count(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1, 2
    )
    SELECT event_type, idx, cnt,
           CAST({_udq_edges('idx', 'duck')[0]} AS BIGINT) AS lo,
           CAST({_udq_edges('idx', 'duck')[1]} AS BIGINT) AS hi,
           CAST({_udq_edges('idx', 'duck')[2]} AS BIGINT) AS est
    FROM bk
    """,
)
def stream_uddq_sketch(spark, sf_dir):
    """R38: streaming UddSketch maintenance (module header) — replayed
    file-by-file with cross-batch sketch merges, flushed by the
    far-future closer, emitted buckets == the batch GROUP BY
    bit-for-bit (order-free int64 counts), projected with T32's exact
    integer bucket edges."""
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("value") > 0.0)
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            F.col("value").cast("double").alias("value"),
        )
    )
    root = tempfile.mkdtemp(prefix="stream_uddq_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = (
            spark.readStream.schema(
                "ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            S.stream_uddq_sketch(stream, watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
            " '__closer__' AS event_type, CAST(1.0 AS DOUBLE) AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = (
            spark.read.parquet(sink)
            .where(F.col("event_type") != "__closer__")
            .select(
                "event_type",
                "idx",
                "cnt",
                F.expr(
                    f"CAST({_udq_edges('idx', 'spark')[0]} AS BIGINT)"
                ).alias("lo"),
                F.expr(
                    f"CAST({_udq_edges('idx', 'spark')[1]} AS BIGINT)"
                ).alias("hi"),
                F.expr(
                    f"CAST({_udq_edges('idx', 'spark')[2]} AS BIGINT)"
                ).alias("est"),
            )
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_KMV_K = 64
_TWO60 = 1 << 60
_SKMV_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_SKMV_EST = (
    f"CASE WHEN d.nd < {_KMV_K} THEN CAST(d.nd AS DOUBLE)"
    f" ELSE ((CAST({_KMV_K - 1} AS DOUBLE) * CAST({_TWO60} AS DOUBLE))"
    f" / CAST(r.hv AS DOUBLE)) END"
)


@register(
    "stream_kmv_distinct",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(CAST(floor(100.0 * value + 0.5)
                AS BIGINT) AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events
    ),
    kt AS (SELECT DISTINCT event_type, hv FROM c),
    kd AS (SELECT event_type, count(*)::BIGINT AS nd
           FROM kt GROUP BY 1),
    kr AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY hv) AS rn
      FROM kt
    )
    SELECT d.event_type,
           CAST(least(d.nd, {_KMV_K}) AS BIGINT) AS k_kept,
           r.hv AS theta,
           {_SKMV_F6.format(x=_SKMV_EST)} AS kmv_estimate
    FROM kd d JOIN kr r ON d.event_type = r.event_type
     AND r.rn = least(d.nd, {_KMV_K})
    """,
)
def stream_kmv_distinct(spark, sf_dir):
    """R43: streaming KMV/theta distinct-sketch maintenance
    (``streaming/continuous.stream_kmv``, the 9th
    applyInPandasWithState operator): bottom-{_KMV_K} distinct 60-bit
    md5 hashes of the value cents per event type, state bounded by k.
    Bottom-k-of-a-set is order-free, so the drained (theta, estimate)
    rows are bit-equal to the batch re-derivation however the stream
    is micro-batched — FULLY oracled like R38.  Replayed
    file-by-file with the far-future closer flush."""
    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    root = tempfile.mkdtemp(prefix="stream_kmv_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = (
            spark.readStream.schema(
                "ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            S.stream_kmv(stream, watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
            " '__closer__' AS event_type, CAST(1.0 AS DOUBLE) AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(
            F.col("event_type") != "__closer__"
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
