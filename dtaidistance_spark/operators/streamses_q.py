"""R51 — streaming SES level monitoring per event type
(``streaming/continuous.stream_ses_level``, the 10th
applyInPandasWithState operator), FULLY oracled: the streaming twin
of TS81's batch SES — a live rollup pipeline keeping a smoothed level
and one-step error score per metric as events arrive.

A sequential recursion is order-sensitive, so the kernel takes the
R42 Page-Hinkley posture: state buffers the key's (ts, event_id,
cents) triples and the drain sorts and folds — emitted doubles are
independent of micro-batching, and because the numpy fold mirrors the
batch SQL fold op-for-op (identical IEEE trees, the TS81 machinery),
the drained rows hash-match DuckDB's ordered-array re-derivation.

The registry query replays the events table file-by-file
(maxFilesPerTrigger=1 → genuine cross-batch state merges), flushes
with the far-future closer row, and compares against the oracle's
``list(cents ORDER BY ts, event_id)`` + the TS81 list_reduce fold.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.qutil import detach
from dtaidistance_spark.operators.ses_q import _ses_fold

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_SAD_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(range(1, CAST(n AS BIGINT)),"
    " j -> CAST(abs(v[j + 1] - v[j]) AS BIGINT))), (a, q) -> a + q)"
)


@register(
    "stream_ses_level",
    oracle=f"""
    WITH ordered AS (
      SELECT event_type,
             list(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  ORDER BY ts, event_id) AS v
      FROM events GROUP BY event_type
    ),
    sized AS (
      SELECT event_type, v, CAST(len(v) AS BIGINT) AS n FROM ordered
    ),
    folded AS (
      SELECT event_type, n,
             {_SAD_DUCK} AS sad,
             {_ses_fold("duck")} AS acc
      FROM sized WHERE n >= 3
    )
    SELECT event_type, n AS n_events, sad,
           {_F6.format(x="acc.sse")} AS ses_sse,
           {_F6.format(x="acc.sae")} AS ses_sae,
           {_F6.format(x="acc.l")} AS final_level,
           CASE WHEN sad > 0 THEN {_F6.format(x="(acc.sae / CAST(sad AS DOUBLE))")}
                ELSE CAST(NULL AS DOUBLE) END AS mase
    FROM folded
    """,
)
def stream_ses_level(spark, sf_dir):
    """R51: streaming SES level per event type (module header) —
    replayed file-by-file, buffered-sort drain, bit-equal to the
    batch ordered-array fold."""
    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    root = tempfile.mkdtemp(prefix="stream_ses_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = (
            spark.readStream.schema(
                "ts timestamp, event_id long, event_type string,"
                " value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            S.stream_ses_level(stream, watermark="30 minutes")
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
            " CAST(0 AS BIGINT) AS event_id,"
            " '__closer__' AS event_type, CAST(1.0 AS DOUBLE) AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = (
            spark.read.parquet(sink)
            .where(F.col("event_type") != "__closer__")
            .select(
                "event_type",
                "n_events",
                "sad",
                "ses_sse",
                "ses_sae",
                "final_level",
                "mase",
            )
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
