"""Registry query for Structured Streaming (R13): run the watermarked
streaming tier aggregation over the events table replayed as a file
stream, drain with availableNow, and return the emitted windows.

Oracle note: append mode only emits watermark-closed windows, so a
far-future closing row is streamed last to flush everything; the
result then equals the batch GROUP BY exactly (DuckDB oracle)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.qutil import detach
from dtaidistance_spark.operators.queries import T, register


@register(
    "stream_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type AS key,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_events_hourly(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="stream_q_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"
    def drain():
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(
                F.window("ts", "1 hour").alias("w"),
                F.col("event_type").alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                F.col("w")["start"].alias("window_start"),
                "key", "n_events", "sum_value",
            )
        )
        q = (
            agg.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        # closing row far past every event, in its OWN micro-batch (the
        # watermark only advances between batches): flushes all windows
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "'__closer__' AS event_type, 0.0 AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(F.col("key") != "__closer__")
        return detach(spark, out)  # survive rmtree of the temp sink
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("stream_dba_rollup")
def stream_dba_rollup_q(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    streaming DBA tier rollup of the synthetic token stream — windows
    emit exactly once on event-time timeout; barycenters are
    bit-identical to the batch dba_rollup (gated in test_streaming).
    Rows-only (DBA is not SQL-expressible); the counts projection
    ``stream_dba_counts`` carries the official DuckDB oracle."""
    return _run_stream_dba(spark, n=256)


def _run_stream_dba(spark, n=256, watermark="2 minutes"):
    """Shared machinery: replay n synthetic sequences as a file stream
    through the stateful DBA rollup (event-time timeout emission), drain
    with availableNow, push the watermark with a closer batch, and read
    the emitted windows back (closer windows never close, so they are
    never emitted; the filter is belt-and-braces).

    ``watermark`` is the lateness tolerance: availableNow replays the
    parquet files one per micro-batch in LISTING order, not time order,
    so rows can arrive "late" relative to the advancing watermark and
    be dropped — correct streaming semantics. A tolerance wider than
    the replay disorder (e.g. '30 minutes' over this 5-minute corpus)
    makes the result exactly equal to the batch GROUP BY, which is what
    the oracled counts query uses."""
    import shutil
    import tempfile

    from dtaidistance_spark import synth
    from dtaidistance_spark.streaming import continuous as S

    root = tempfile.mkdtemp(prefix="stream_dba_q_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        q = (
            S.stream_dba_rollup(
                S.read_token_stream(spark, src, max_files_per_trigger=1),
                tier="1 minute", watermark=watermark,
            )
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        synth.sequences_df(spark, n).write.parquet(src)
        drain()
        synth.sequences_df(spark, 2).selectExpr(
            "doc_id", "tokens", "n_tok", "source",
            "ts + INTERVAL 10 DAYS AS ts"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(
            F.col("window_start") < "2026-06-01"
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_dba_counts",
    oracle=None,  # set below: needs synth_sql import after module load
)
def stream_dba_counts(spark, sf_dir):
    """OFFICIAL oracle for the custom stateful streaming operator
    (applyInPandasWithState DBA rollup, R13): the emitted windows' group
    cardinalities must equal DuckDB SQL over the independently
    re-derived synthetic input table — the streaming engine's
    exactly-once window emission, watermark handling, and state
    aggregation all sit on the hash path."""
    out = _run_stream_dba(spark, n=256, watermark="30 minutes")
    return out.select("key", "window_start", "n_series", "n_points")


# register the oracle (synth_sql lives in synth_q; import here to avoid
# a cycle at module top)
from dtaidistance_spark.operators.queries import ORACLE as _ORACLE  # noqa: E402
from dtaidistance_spark.operators.synth_q import synth_sql as _synth_sql  # noqa: E402

_ORACLE["stream_dba_counts"] = _synth_sql(256) + """
    SELECT source AS key, date_trunc('minute', ts)::TIMESTAMP AS window_start,
           count(*) AS n_series, sum(n_tok)::BIGINT AS n_points
    FROM synth GROUP BY 1, 2
"""


@register(
    "stream_exact_dedup",
    oracle="SELECT DISTINCT md5(text) AS content_md5 FROM documents",
)
def stream_exact_dedup(spark, sf_dir):
    """Streaming exact dedup — the ingest-time twin of the batch
    ``exact_dedup`` operator: documents arrive as a file stream, each
    doc's content hash is checked against bounded streaming state
    (``dropDuplicatesWithinWatermark``: state evicted once the event-time
    watermark passes, so a 24/7 ingest never accumulates unbounded seen
    keys — the production shape; an unbounded-retention variant is just
    ``dropDuplicates``). The second micro-batch REPLAYS the first 50
    docs, so cross-batch duplicate suppression is actually exercised,
    not just within-batch. Emitted keys must equal DuckDB's
    ``SELECT DISTINCT md5(text)`` over the corpus — exactly-once
    emission per key is on the hash path."""
    import shutil
    import tempfile

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        # deterministic event time: corpus epoch + doc_id seconds
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
    )
    root = tempfile.mkdtemp(prefix="stream_dedup_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        stream = spark.readStream.schema(
            "doc_id bigint, text string, ts timestamp"
        ).parquet(src)
        deduped = (
            stream.withColumn("content_md5", F.md5("text"))
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["content_md5"])
            .select("content_md5")
        )
        q = (
            deduped.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        docs.write.parquet(src)
        drain()
        docs.where(F.col("doc_id") < 50).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink)
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_session_counts",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    l AS (
      SELECT *,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM l
    )
    SELECT user_id,
           min(ts)::TIMESTAMP AS session_start,
           (max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP AS session_end,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM g GROUP BY user_id, sid
    """,
)
def stream_session_counts(spark, sf_dir):
    """R13/R20 streaming twin, FULLY oracled: per-user session windows
    (30-minute gap) computed by Structured Streaming with a watermark
    over the replayed events file stream — the closing-row flush makes
    append mode emit every session, and the result must equal the
    batch gaps-and-islands sessionization bit-for-bit (total_value is
    a within-session sum; round(6) absorbs engine summation order).
    The batch twin is ``session_windows``; this proves the SAME
    session semantics hold under incremental watermarked execution
    with cross-batch session state."""
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("ts", "user_id", "value")
    )
    root = tempfile.mkdtemp(prefix="stream_sess_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(
                F.col("user_id"),
                F.session_window("ts", "30 minutes").alias("sw"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
            )
            .select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"),
                "n_events",
                "total_value",
            )
        )
        q = (
            agg.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, 0.0 AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(F.col("user_id") >= 0)
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_sink_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(192)) AS i),
    hh AS (
      SELECT i,
        ('0x' || substr(md5('doc' || lpad(i::VARCHAR, 12, '0')), 1, 15))::BIGINT
          AS h
      FROM idsx
    ),
    ss AS (
      SELECT i,
        CASE WHEN h % 100 < 80 THEN 'web' WHEN h % 100 < 95 THEN 'code'
             ELSE 'books' END AS source,
        CASE WHEN h % 97 < 8 THEN least((64 + h % 1985) * 4, 8192)
             ELSE 64 + h % 1985 END AS n
      FROM hh
    )
    SELECT source,
           count(*) AS n_rows,
           sum(n)::BIGINT AS sum_n_tok,
           3 AS n_stream_snapshots,
           2 AS last_batch,
           true AS replay_skipped
    FROM ss GROUP BY 1
    """,
)
def stream_sink_check(spark, sf_dir):
    """Exactly-once streaming sink into TableIO (the R13 <-> §2.8
    bridge), driver-oracled: 192 synth rows arrive as a 3-file stream
    (maxFilesPerTrigger=1 -> 3 micro-batches), each batch committing
    data + its epoch id in ONE atomic manifest commit via foreachBatch;
    then the failure mode is SIMULATED by re-invoking the sink with
    already-committed batch ids (Spark replays foreachBatch after a
    crash between sink and checkpoint advance) — the manifest's
    last_committed_batch watermark makes the replays no-ops, so the
    per-source counts and token sums equal the exactly-once expectation
    DuckDB re-derives, with exactly 3 stream snapshots in history."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.sources.tableio import TableIO
    from dtaidistance_spark.streaming.continuous import (
        TOKEN_STREAM_SCHEMA,
        read_token_stream,
        stream_to_tableio,
        tableio_sink,
    )

    df = synth.sequences_df(spark, 192)
    root = tempfile.mkdtemp(prefix="sink_q_")
    src, ckpt = f"{root}/src", f"{root}/ckpt"
    try:
        for lo in (0, 64, 128):
            df.where(
                (F.col("doc_id") >= f"doc{lo:012d}")
                & (F.col("doc_id") < f"doc{lo + 64:012d}")
            ).coalesce(1).write.mode("append").parquet(src)
        t = TableIO(root, "sunk", partition_by=["source"])
        stream = read_token_stream(
            spark, src, TOKEN_STREAM_SCHEMA, max_files_per_trigger=1
        )
        q = stream_to_tableio(stream, t, ckpt, mode="append")
        q.awaitTermination()
        n_before = t.total_rows()
        # crash-replay simulation: re-deliver epochs 0 and 2
        sink = tableio_sink(t, mode="append")
        replay_df = spark.read.parquet(src)
        sink(replay_df, 0)
        sink(replay_df, 2)
        replay_skipped = t.total_rows() == n_before
        snaps = [s for s in t.snapshots() if s["op"] == "stream"]
        last_batch = int(t.properties()["last_committed_batch"])
        per_src = {
            r["source"]: (int(r["c"]), int(r["s"]))
            for r in t.read(spark)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("c"), F.sum("n_tok").alias("s"))
            .collect()
        }
        rows = [
            (s, c, tot, len(snaps), last_batch, bool(replay_skipped))
            for s, (c, tot) in sorted(per_src.items())
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_rows long, sum_n_tok long, "
            "n_stream_snapshots int, last_batch int, replay_skipped boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_gapfill_locf",
    oracle="""
    WITH hm AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             round(avg(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    sp AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM hm GROUP BY 1),
    grid AS (
      SELECT s.user_id,
             unnest(generate_series(s.mn, s.mx, INTERVAL 1 HOUR)) AS hour
      FROM sp s
    ),
    j AS (
      SELECT g.user_id, g.hour, hm.v
      FROM grid g LEFT JOIN hm
        ON hm.user_id = g.user_id AND hm.h = g.hour
    )
    SELECT user_id, hour,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_locf
    FROM j
    """,
)
def stream_gapfill_locf_q(spark, sf_dir):
    """R12-as-a-stream: continuous stateful LOCF gap-fill
    (``streaming/continuous.stream_gapfill_locf`` —
    applyInPandasWithState, per-user hourly (sum, count) state,
    event-time-timeout emission of the complete filled series exactly
    once). Replayed over the events table and drained with availableNow
    + the far-future closer batch, the emitted rows equal the per-user
    batch gap-fill SQL exactly: hourly-mean grid from each user's first
    to last observed hour, last observation carried forward across
    interior gaps."""
    import shutil
    import tempfile

    from dtaidistance_spark.streaming import continuous as S

    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    root = tempfile.mkdtemp(prefix="stream_gapfill_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            S.stream_gapfill_locf(stream, watermark="30 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        # far-future closer in its OWN micro-batch: advances the
        # watermark past every user's last hour so every key times out
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, 0.0 AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(F.col("user_id") >= 0)
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_gapfill_linear",
    oracle="""
    WITH hm AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             round(avg(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    sp AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM hm GROUP BY 1),
    grid AS (
      SELECT s.user_id,
             unnest(generate_series(s.mn, s.mx, INTERVAL 1 HOUR)) AS hour
      FROM sp s
    ),
    j AS (
      SELECT g.user_id, g.hour AS h, hm.v
      FROM grid g LEFT JOIN hm
        ON hm.user_id = g.user_id AND hm.h = g.hour
    ),
    f AS (
      SELECT user_id, h, v,
          last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
          last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_prev,
          first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS v_next,
          first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY h
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS t_next
      FROM j
    )
    SELECT user_id, h AS hour,
        round(CASE
            WHEN v IS NOT NULL THEN v
            ELSE v_prev + (v_next - v_prev)
                * ((epoch(h) - epoch(t_prev)) / (epoch(t_next) - epoch(t_prev)))
        END + 1e-9, 4) AS v_lin
    FROM f
    """,
)
def stream_gapfill_linear_q(spark, sf_dir):
    """R11-as-a-stream: the linear-interpolation twin of
    ``stream_gapfill_locf`` — same stateful operator in mode='linear',
    emitting each user's complete filled series exactly once with
    interior gaps interpolated between the neighbouring hourly means
    using the batch query's exact float tree (+1e-9 boundary nudge;
    every interior hour has both neighbours by construction, so the
    LOCF fallback arm never fires and the oracle needs no ELSE)."""
    import shutil
    import tempfile

    from dtaidistance_spark.streaming import continuous as S

    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    root = tempfile.mkdtemp(prefix="stream_gapfill_lin_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            S.stream_gapfill_locf(
                stream, watermark="30 minutes", mode="linear"
            )
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, 0.0 AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(F.col("user_id") >= 0)
        return detach(
            spark, out.select("user_id", "hour", F.col("v_locf").alias("v_lin"))
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# R26 — streaming sketch maintenance: the HLL distinct sketch (T31) kept
# incrementally by Structured Streaming. Per 2-minute event-time window
# and source, the register aggregate max(rho) runs under a watermark in
# append mode — the canonical "continuous aggregate stores 256 bytes per
# window" plan. The cross-window register-wise max of the EMITTED
# windows must then equal the batch sketch built over all tokens
# (merged_equals_batch), proving the streaming tier can answer
# distinct-count queries for any window union without rescanning raw
# data. Same portable md5/bin() hash contract as T31, so DuckDB
# re-derives every per-window register array, md5, and dyadic-fold
# estimate bit-for-bit.
# ---------------------------------------------------------------------------

def _stream_hll_oracle():
    from dtaidistance_spark.operators.sketch_q import (
        _HLL_EST_DUCK,
        _HLL_N,
    )
    from dtaidistance_spark.operators.synth_q import synth_sql

    return synth_sql(_HLL_N) + f"""
    , tok AS (SELECT source, ts, unnest(tokens) AS t FROM synth),
    hh AS (SELECT source,
             to_timestamp((epoch_us(ts) // 120000000) * 120)::TIMESTAMP
               AS window_start,
             ('0x' || substr(md5(t::VARCHAR), 1, 15))::BIGINT AS hv
           FROM tok),
    ir AS (SELECT source, window_start, hv % 256 AS idx,
             CASE WHEN hv // 256 = 0 THEN 53
                  ELSE 53 - length(bin(hv // 256)) END AS rho FROM hh),
    regrows AS (SELECT source, window_start, idx, max(rho) AS r
                FROM ir GROUP BY 1, 2, 3),
    packed AS (SELECT source, window_start, count(*)::BIGINT AS n_regs,
                 list(idx ORDER BY idx) AS idxs,
                 list(r ORDER BY idx) AS rs
               FROM regrows GROUP BY 1, 2),
    arr AS (SELECT source, window_start, n_regs,
              list_transform(range(256), j ->
                coalesce(rs[list_position(idxs, j)], 0)) AS regs
            FROM packed),
    wnd AS (SELECT source, window_start, n_regs,
              md5(array_to_string(regs, ',')) AS reg_md5,
              {_HLL_EST_DUCK} AS est
            FROM arr),
    mrows AS (SELECT source, idx, max(r) AS r FROM regrows GROUP BY 1, 2),
    mpacked AS (SELECT source, list(idx ORDER BY idx) AS idxs,
                  list(r ORDER BY idx) AS rs FROM mrows GROUP BY source),
    marr AS (SELECT source, md5(array_to_string(list_transform(range(256),
               j -> coalesce(rs[list_position(idxs, j)], 0)), ','))
               AS merged_md5 FROM mpacked)
    SELECT wnd.source, window_start, n_regs, reg_md5, est,
           merged_md5, merged_md5 AS batch_md5,
           TRUE AS merged_equals_batch
    FROM wnd JOIN marr ON wnd.source = marr.source
    """


@register("stream_hll_sketch", oracle=_stream_hll_oracle())
def stream_hll_sketch(spark, sf_dir):
    """R26: streaming continuous aggregate maintaining the T31 HLL
    sketch — watermarked per-(2-min window, source) max(rho) register
    aggregate over the replayed token stream, drained with availableNow
    and flushed by a closing row. Emits each window's packed-register
    md5 and dyadic-fold estimate, plus the contract columns: the
    register-wise max across the EMITTED windows (merged_md5) equals
    the batch sketch over all tokens (batch_md5, from the batch T31
    path) — the streaming rollup answers any-window distinct queries
    from 256 bytes per window. Oracle: DuckDB re-derives every window's
    registers from the synth CTE (no tolerance)."""
    from dtaidistance_spark.operators.sketch_q import (
        _HLL_EST_SPARK,
        _HLL_HV_SPARK,
        _HLL_N,
        _hll_regs_spark,
    )
    from dtaidistance_spark import synth

    tok = synth.sequences_df(spark, _HLL_N).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "source",
        F.explode("tokens").alias("t"),
    )
    root = tempfile.mkdtemp(prefix="stream_hll_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        stream = spark.readStream.schema(
            "ts timestamp, source string, t int"
        ).parquet(src)
        ir = stream.selectExpr(
            "ts",
            "source",
            f"pmod({_HLL_HV_SPARK}, 256) AS idx",
            f"CASE WHEN ({_HLL_HV_SPARK} div 256) = 0 THEN 53 "
            f"ELSE 53 - length(bin({_HLL_HV_SPARK} div 256)) END AS rho",
        )
        agg = (
            ir.withWatermark("ts", "1 minute")
            .groupBy(
                F.window("ts", "2 minutes").alias("w"), "source", "idx"
            )
            .agg(F.max("rho").alias("r"))
            .select(
                F.col("w")["start"].alias("window_start"),
                "source",
                "idx",
                "r",
            )
        )
        q = (
            agg.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        tok.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "'__closer__' AS source, 0 AS t"
        ).write.mode("append").parquet(src)
        drain()
        rows = spark.read.parquet(sink).where(
            F.col("source") != "__closer__"
        )
        packed = rows.groupBy("source", "window_start").agg(
            F.count("*").alias("n_regs"),
            F.expr(
                "map_from_entries(sort_array(collect_list(struct(idx, r))))"
            ).alias("m"),
        )
        wnd = packed.selectExpr(
            "source",
            "window_start",
            "n_regs",
            "transform(sequence(0, 255), j -> "
            "coalesce(element_at(m, cast(j AS BIGINT)), 0)) AS regs",
        ).selectExpr(
            "source",
            "window_start",
            "n_regs",
            "md5(array_join(regs, ',')) AS reg_md5",
            f"{_HLL_EST_SPARK} AS est",
        )
        merged = (
            rows.groupBy("source", "idx")
            .agg(F.max("r").alias("r"))
            .groupBy("source")
            .agg(
                F.expr(
                    "map_from_entries(sort_array(collect_list("
                    "struct(idx, r))))"
                ).alias("m")
            )
            .selectExpr(
                "source",
                "md5(array_join(transform(sequence(0, 255), j -> "
                "coalesce(element_at(m, cast(j AS BIGINT)), 0)), ','))"
                " AS merged_md5",
            )
        )
        batch = _hll_regs_spark(spark).selectExpr(
            "source", "md5(array_join(regs, ',')) AS batch_md5"
        )
        out = (
            wnd.join(merged, "source")
            .join(batch, "source")
            .withColumn(
                "merged_equals_batch",
                F.col("merged_md5") == F.col("batch_md5"),
            )
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)



@register(
    "stream_ohlc",
    oracle="""
    WITH s AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS window_start,
             epoch_us(ts) AS tu, event_id, value
      FROM events
    ),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, window_start
                           ORDER BY tu, event_id) AS rn1,
        row_number() OVER (PARTITION BY event_type, window_start
                           ORDER BY tu DESC, event_id DESC) AS rn2
      FROM s
    )
    SELECT event_type, window_start,
           count(*) AS n_events,
           max(CASE WHEN rn1 = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn2 = 1 THEN value END) AS close,
           round(sum(value), 6) AS volume
    FROM r GROUP BY event_type, window_start
    """,
)
def stream_ohlc(spark, sf_dir):
    """R28: streaming OHLC candlesticks — the batch ``ohlc_candlestick``
    continuous-aggregate maintained by Structured Streaming: watermarked
    1-day windows per event_type in append mode, open/close via
    ``min_by``/``max_by`` on the total (tu, event_id) order (streaming
    cannot run row_number, but arg-extrema aggregates ARE incremental —
    that's the point: the candlestick is mergeable state, 6 numbers per
    window).  Double availableNow drain + far-future closing row per
    the module pattern; the emitted windows then equal the batch
    row_number SQL exactly (DuckDB oracle, volume round(6)).  At scale
    this is the real-time tier of the OHLC continuous aggregate:
    bounded state per open window, exactly-once emission on watermark
    close."""
    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "event_id",
        "value",
    )
    root = tempfile.mkdtemp(prefix="stream_ohlc_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, event_id bigint, value double"
        ).parquet(src)
        key = F.struct(
            F.unix_micros(F.col("ts")).alias("tu"), F.col("event_id")
        )
        agg = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min_by("value", key).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", key).alias("close"),
                F.round(F.sum("value"), 6).alias("volume"),
            )
            .select(
                "event_type",
                F.col("w")["start"].alias("window_start"),
                "n_events",
                "open",
                "high",
                "low",
                "close",
                "volume",
            )
        )
        q = (
            agg.writeStream.format("parquet")
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
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "'__closer__' AS event_type, CAST(-1 AS BIGINT) AS event_id, "
            "0.0 AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(
            F.col("event_type") != "__closer__"
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_rate_cusum",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    o AS (
      SELECT user_id, tu,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tu, event_id) AS rn
      FROM s
    ),
    g AS (
      SELECT user_id, rn - 1 AS gi,
             tu - lag(tu) OVER (PARTITION BY user_id ORDER BY rn) AS gap
      FROM o
    ),
    gg AS (SELECT user_id, gi, gap FROM g WHERE gap IS NOT NULL),
    m AS (
      SELECT user_id, count(*)::BIGINT AS m, sum(gap)::BIGINT AS total
      FROM gg GROUP BY 1
    ),
    c AS (
      SELECT gg.user_id, gg.gi,
             sum(gap) OVER (PARTITION BY gg.user_id ORDER BY gi)::BIGINT
               AS cum,
             m.m, m.total
      FROM gg JOIN m USING (user_id)
    ),
    t AS (
      SELECT user_id, gi, m, total,
             abs(m * cum - gi * total)::BIGINT AS t_abs,
             row_number() OVER (PARTITION BY user_id
                 ORDER BY abs(m * cum - gi * total) DESC, gi) AS rk
      FROM c WHERE gi < m AND m >= 2
    )
    SELECT user_id, (m + 1)::BIGINT AS n_events, gi AS cp_gap_index,
           t_abs AS t_max, total AS total_span_us,
           CASE WHEN total > 0 THEN
             floor((CAST(t_abs AS DOUBLE)
                    / CAST(m * total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
           ELSE 0.0 END AS dev_ratio
    FROM t WHERE rk = 1
    """,
)
def stream_rate_cusum_q(spark, sf_dir):
    """R30: streaming CUSUM rate-change detection
    (``streaming/continuous.stream_rate_cusum`` — the 4th
    applyInPandasWithState operator): per-user inter-arrival-gap CUSUM
    kept in pure int64 (T_i = m·C_i − i·G), emitted exactly once per
    user on event-time timeout.  Replayed over the purchase stream and
    drained with availableNow + the far-future closer, the emitted
    verdicts equal the batch SQL re-derivation bit-for-bit — integer
    CUSUM statistics, argmax split with (|T| DESC, gap-index) ties,
    and the single HALF_UP-floored float ratio."""
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_id"
    )
    root = tempfile.mkdtemp(prefix="stream_cusum_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = spark.readStream.schema(
            "ts timestamp, user_id long, event_id long"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            S.stream_rate_cusum(stream, watermark="30 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, CAST(-1 AS LONG) AS event_id"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(
            (F.col("user_id") >= 0) & (F.col("n_events") >= 3)
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_counter_agg",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'click'
    ),
    l AS (
      SELECT *, lag(cents) OVER (PARTITION BY user_id
                                 ORDER BY tu, event_id) AS prev
      FROM s
    ),
    c AS (
      SELECT *,
             CASE WHEN prev IS NOT NULL AND cents < prev THEN prev
                  ELSE 0 END::BIGINT AS rb
      FROM l
    ),
    cc AS (
      SELECT *,
             cents + sum(rb) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                   ROWS UNBOUNDED PRECEDING) AS corrected,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tu DESC, event_id DESC) AS rn_last,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tu, event_id) AS rn_first
      FROM c
    )
    SELECT user_id,
           count(*)::BIGINT AS n_samples,
           sum((rb > 0)::INT)::BIGINT AS n_resets,
           max(CASE WHEN rn_first = 1 THEN corrected END)::BIGINT
             AS first_cents,
           max(CASE WHEN rn_last = 1 THEN corrected END)::BIGINT
             AS last_cents,
           (max(CASE WHEN rn_last = 1 THEN corrected END)
            - max(CASE WHEN rn_first = 1 THEN corrected END))::BIGINT
             AS delta_cents
    FROM cc GROUP BY user_id
    """,
)
def stream_counter_agg_q(spark, sf_dir):
    """R31: streaming reset-aware counter aggregation
    (``streaming/continuous.stream_counter_agg`` — the 5th
    applyInPandasWithState operator): the R17 ``counter_agg`` verdict
    maintained incrementally per user and emitted exactly once on
    event-time timeout.  Event values are integerized to cents on the
    JVM side (exact for the 2-dp corpus), so the Python state fold is
    pure int64 — reset detection, cumulative base, corrected levels,
    delta — and the drained stream equals the batch window-SQL oracle
    bit-for-bit with no float anywhere in the operator."""
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_id",
        "value",
    )
    root = tempfile.mkdtemp(prefix="stream_counter_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = spark.readStream.schema(
            "ts timestamp, user_id long, event_id long, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            S.stream_counter_agg(stream, watermark="30 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, CAST(-1 AS LONG) AS event_id, "
            "CAST(0.0 AS DOUBLE) AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(F.col("user_id") >= 0)
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_attr_join",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS cu
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pu
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.click_id, p.purchase_id,
           (p.pu - c.cu)::BIGINT AS gap_us
    FROM c JOIN p ON p.user_id = c.user_id
       AND p.pu >= c.cu AND p.pu <= c.cu + 3600000000
    """,
)
def stream_attr_join(spark, sf_dir):
    """R32: watermarked STREAM-STREAM inner join — the one stateful
    streaming shape the registry didn't exercise yet (no aggregation,
    no applyInPandasWithState: Spark's symmetric-hash join buffers both
    sides under the watermark and emits on match).  Click→purchase
    attribution: every (click, purchase) pair of the same user with
    the purchase inside the click's 1-hour window.  The join condition
    is equality on user_id plus an integer-microsecond time range, so
    the emitted pair set is EXACTLY the batch range join — deterministic
    set semantics, all int64 (gap_us included), bit-exact oracle.

    Scale shape: both streams shuffle once onto user_id; the range
    condition bounds join state to 1 hour + watermark of per-user
    events on each side, and the watermark ages buffered rows out —
    state is O(rate × window), independent of stream length."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("ts").cast("timestamp").alias("cts"),
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("ts").cast("timestamp").alias("pts"),
        "user_id",
        F.col("event_id").alias("purchase_id"),
    )
    root = tempfile.mkdtemp(prefix="stream_attr_")
    csrc, psrc = f"{root}/clicks", f"{root}/purchases"
    sink, ckpt = f"{root}/sink", f"{root}/ckpt"
    try:
        clicks.write.parquet(csrc)
        purch.write.parquet(psrc)
        cs = (
            spark.readStream.schema(
                "cts timestamp, c_user long, click_id long"
            ).option("maxFilesPerTrigger", 1).parquet(csrc)
            .withWatermark("cts", "2 hours")
        )
        ps = (
            spark.readStream.schema(
                "pts timestamp, user_id long, purchase_id long"
            ).option("maxFilesPerTrigger", 1).parquet(psrc)
            .withWatermark("pts", "2 hours")
        )
        j = cs.join(
            ps,
            F.expr(
                "c_user = user_id AND pts >= cts"
                " AND pts <= cts + interval 1 hour"
            ),
            "inner",
        ).select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"),
        )
        q = (
            j.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return detach(spark, spark.read.parquet(sink))
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_attr_join_outer",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS cu
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pu
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.click_id, p.purchase_id,
           (p.pu - c.cu)::BIGINT AS gap_us
    FROM c LEFT JOIN p ON p.user_id = c.user_id
       AND p.pu >= c.cu AND p.pu <= c.cu + 3600000000
    """,
)
def stream_attr_join_outer(spark, sf_dir):
    """R32b: LEFT-OUTER watermarked stream-stream join — the semantics
    R32 doesn't touch: an unmatched left row (a click that converted to
    no purchase within its hour) can only be emitted once the watermark
    PROVES no future match exists, i.e. on state eviction.  Because the
    global watermark is the MIN across sources, far-future closer rows
    are appended to BOTH streams before the second drain; the flushed
    output then equals the batch LEFT range join exactly — nulls
    included.  Same state bound as R32."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("ts").cast("timestamp").alias("cts"),
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("ts").cast("timestamp").alias("pts"),
        "user_id",
        F.col("event_id").alias("purchase_id"),
    )
    root = tempfile.mkdtemp(prefix="stream_attro_")
    csrc, psrc = f"{root}/clicks", f"{root}/purchases"
    sink, ckpt = f"{root}/sink", f"{root}/ckpt"

    def drain():
        cs = (
            spark.readStream.schema(
                "cts timestamp, c_user long, click_id long"
            ).option("maxFilesPerTrigger", 1).parquet(csrc)
            .withWatermark("cts", "2 hours")
        )
        ps = (
            spark.readStream.schema(
                "pts timestamp, user_id long, purchase_id long"
            ).option("maxFilesPerTrigger", 1).parquet(psrc)
            .withWatermark("pts", "2 hours")
        )
        j = cs.join(
            ps,
            F.expr(
                "c_user = user_id AND pts >= cts"
                " AND pts <= cts + interval 1 hour"
            ),
            "left_outer",
        ).select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"),
        )
        q = (
            j.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        # 4 files/side keeps multiple micro-batches (incremental-join
        # coverage) without dozens of 1-file triggers
        clicks.coalesce(4).write.parquet(csrc)
        purch.coalesce(4).write.parquet(psrc)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS cts,"
            " CAST(-1 AS LONG) AS c_user, CAST(-1 AS LONG) AS click_id"
        ).write.mode("append").parquet(csrc)
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS pts,"
            " CAST(-1 AS LONG) AS user_id, CAST(-1 AS LONG) AS purchase_id"
        ).write.mode("append").parquet(psrc)
        drain()
        out = spark.read.parquet(sink).where(F.col("click_id") >= 0)
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("stream_sdt")
def stream_sdt_q(spark, sf_dir):
    """E4-as-a-stream: swinging-door compression of each user's 'error'
    value stream run as the 6th applyInPandasWithState operator — raw
    points in, archived points out exactly once on event-time timeout
    (the process-historian deployment shape; the north star names this
    compression tier explicitly). Rows-only in the driver artifact; the
    oracled family twin is ``sdt_check`` (independent SQL range-join
    reconstruction bound) and the pytest gate pins row-for-row equality
    with the batch E4 kernel."""
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    ).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "value",
    )
    root = tempfile.mkdtemp(prefix="stream_sdt_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            S.stream_sdt(stream, tol=5.0, watermark="30 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, CAST(0.0 AS DOUBLE) AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .select(
                "user_id",
                "idx",
                F.expr("timestamp_micros(tu)").alias("ts"),
                "value",
            )
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_page_hinkley",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'view'
    ),
    o AS (
      SELECT user_id, cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tu, event_id) AS t
      FROM s
    ),
    m AS (
      SELECT user_id, count(*)::BIGINT AS n, sum(cents)::BIGINT AS cn
      FROM o GROUP BY 1
    ),
    w AS (
      SELECT o.user_id, o.t, m.n,
             (m.n * sum(o.cents) OVER (PARTITION BY o.user_id
                                       ORDER BY o.t)
              - o.t * m.cn - o.t * m.n * 25)::BIGINT AS mstat
      FROM o JOIN m USING (user_id) WHERE m.n >= 3
    ),
    g AS (
      SELECT user_id, t, n,
             (mstat - min(mstat) OVER (PARTITION BY user_id
                                       ORDER BY t))::BIGINT AS gap
      FROM w
    ),
    r AS (
      SELECT user_id, n, gap, t,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY gap DESC, t) AS rk,
             min(CASE WHEN gap > n * 25000 THEN t END)
               OVER (PARTITION BY user_id) AS t_cross
      FROM g
    )
    SELECT user_id, n AS n_events, gap AS ph_stat, t AS t_peak,
           CAST(CASE WHEN gap > n * 25000 THEN 1 ELSE 0 END AS BIGINT)
             AS alarm,
           COALESCE(t_cross, 0)::BIGINT AS t_alarm
    FROM r WHERE rk = 1
    """,
)
def stream_page_hinkley_q(spark, sf_dir):
    """R42: streaming Page-Hinkley mean-drift detection
    (``streaming/continuous.stream_page_hinkley`` — the 8th
    applyInPandasWithState operator): per-user cleared-integer PH
    drawup on event-value cents (m_t = n·C_t − t·C_n − t·n·δ,
    PH = max drawup, alarm PH > n·λ; δ = 25, λ = 25 000 cents),
    emitted exactly once per user on event-time timeout.  Replayed
    over the 'view' stream and drained with availableNow + the
    far-future closer, the verdicts equal the batch SQL re-derivation
    bit-for-bit — integer PH statistics, FIRST-argmax peak ties, and
    the 0 sentinel for never-crossed alarms."""
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type") == "view"
    ).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_id",
        "value",
    )
    root = tempfile.mkdtemp(prefix="stream_ph_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = spark.readStream.schema(
            "ts timestamp, user_id long, event_id long, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            S.stream_page_hinkley(stream, watermark="30 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    try:
        ev.write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts, "
            "CAST(-1 AS LONG) AS user_id, CAST(-1 AS LONG) AS event_id, "
            "0.0 AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = spark.read.parquet(sink).where(
            (F.col("user_id") >= 0) & (F.col("n_events") >= 3)
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
