"""Structured Streaming continuous aggregates (SURVEY §2 R13).

Architecture split (classic lambda, stated explicitly): the STREAMING
path maintains live per-window tier stats (count / sum / avg / min /
max of points, sequence counts) with watermarked tumbling or session
windows — all JVM-side streaming-native aggregates, no Python in the
stream. The exact DBA barycenter tier is the BATCH continuous
aggregate (:mod:`..plans.continuous`), which backfills the same
windows incrementally; DBA needs the whole member set of a closed
window, which is precisely what the watermark-delimited batch refresh
provides. This keeps the streaming state store small (a few numbers
per window) at 10^12-sequence scale instead of buffering raw token
arrays in state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_STREAM_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp"
)


def read_token_stream(
    spark: SparkSession, path: str, schema: str = TOKEN_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based token stream (each new parquet file = one micro-batch
    of arriving sequences)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def stream_tier_stats(
    stream: DataFrame,
    tier: str = "1 minute",
    watermark: str = "2 minutes",
    key_col: str = "source",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window tier stats. Late rows beyond the
    watermark are dropped (gated in tests); output mode 'append' emits
    each window once, when the watermark passes it — exactly the
    point at which the batch DBA refresh may finalize the window."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), tier).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_series"),
            F.sum("n_tok").alias("n_points"),
            F.avg("n_tok").alias("avg_len"),
            F.min("n_tok").alias("min_len"),
            F.max("n_tok").alias("max_len"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            "key",
            "n_series",
            "n_points",
            F.round("avg_len", 4).alias("avg_len"),
            "min_len",
            "max_len",
        )
    )


def stream_session_windows(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    key_col: str = "source",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows (activity bursts per key, closed after ``gap``
    of silence) — the streaming twin of gap detection."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_series"),
            F.sum("n_tok").alias("n_points"),
        )
        .select(
            F.col("s")["start"].alias("session_start"),
            F.col("s")["end"].alias("session_end"),
            "key",
            "n_series",
            "n_points",
        )
    )


def run_to_memory(
    result: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory table (availableNow
    trigger) — the test/bench harness path; production uses the same
    query with a parquet/TableIO sink and a real trigger."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
