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


def stream_dba_rollup(
    stream: DataFrame,
    tier: str = "1 minute",
    watermark: str = "2 minutes",
    key_col: str = "source",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    value_col: str = "tokens",
    max_members: int = 256,
    dba_window: int = 16,
    dba_max_it: int = 2,
    barycenter_len: int = 128,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    the flagship DBA tier rollup in streaming form.

    Per (key, window) group the state accumulates members as arriving
    micro-batches are folded in; an EVENT-TIME timeout fires once the
    watermark passes the window end, at which point the group emits one
    DBA barycenter row (identical kernel to the batch
    :func:`..operators.rollup.dba_rollup`) and drops its state — append
    semantics, each window exactly once, late rows beyond the watermark
    never reach the operator.

    Bounded state: at most ``max_members`` members are retained per
    group, keeping the SMALLEST doc_ids (a bottom-k sketch —
    deterministic in the input SET, independent of arrival order and
    micro-batch boundaries). ``n_series``/``n_points`` stay exact
    counters. For groups within the bound the emitted barycenter is
    bit-identical to the batch rollup (gated in tests); beyond it the
    batch stride sample and the streaming bottom-k sketch are both
    deterministic but differ — the documented streaming trade-off.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from dtaidistance_spark.operators.rollup import ROLLUP_SCHEMA, rollup_group

    tier_s = {"1 minute": 60, "1 hour": 3600, "1 day": 86400}[tier]

    # the watermarked event-time column must survive the projection for
    # event-time timeouts to be legal — keep ts alongside the group key;
    # same degenerate-row policy as the batch rollup (drop null/empty)
    keyed = stream.where(F.size(F.col(value_col)) > 0).select(
        F.col(key_col).cast("string").alias("key"),
        F.window(F.col(ts_col), tier)["start"].alias("window_start"),
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("array<double>").alias("_v"),
        F.col(ts_col).alias("_ts"),
    ).withWatermark("_ts", watermark)

    state_schema = (
        "ids array<string>, vecs array<array<double>>, "
        "n_series long, n_points long"
    )

    def fn(key, pdfs, state):
        k, w = key
        if state.hasTimedOut:
            ids, vecs, n_series, n_points = state.get
            order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
            arrays = [np.asarray(vecs[i], dtype=np.float64) for i in order]
            center, _, _ = rollup_group(
                arrays, max_members=max_members, dba_window=dba_window,
                dba_max_it=dba_max_it, barycenter_len=barycenter_len,
            )
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k],
                    "window_start": [w],
                    "n_series": [int(n_series)],
                    "n_points": [int(n_points)],
                    "barycenter": [list(center)],
                }
            )
            return
        if state.exists:
            ids, vecs, n_series, n_points = state.get
            ids, vecs = list(ids), list(vecs)
        else:
            ids, vecs, n_series, n_points = [], [], 0, 0
        for pdf in pdfs:
            for i, v in zip(pdf["_id"], pdf["_v"]):
                n_series += 1
                n_points += len(v)
                ids.append(str(i))
                # pure-Python floats: the state pickler cannot ship
                # numpy scalars to the JVM row
                vecs.append(np.asarray(v, dtype=np.float64).tolist())
        if len(ids) > max_members:
            # bottom-k by doc_id: arrival-order independent
            order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
            keep = sorted(order[:max_members])
            ids = [ids[j] for j in keep]
            vecs = [vecs[j] for j in keep]
        state.update((ids, vecs, int(n_series), int(n_points)))
        # naive datetimes are UTC here (session TZ) — timegm, never
        # .timestamp(), which would re-interpret in the host's local TZ
        import calendar

        end_ms = calendar.timegm(w.timetuple()) * 1000 + tier_s * 1000
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))
        return
        yield  # pragma: no cover — make fn a generator on every path

    return keyed.groupBy("key", "window_start").applyInPandasWithState(
        fn,
        outputStructType=ROLLUP_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


def tableio_sink(table, mode: str = "append"):
    """Exactly-once foreachBatch sink into a :class:`TableIO` table
    (the Iceberg streaming-sink commit protocol): each micro-batch
    commits its data AND the epoch id (``last_committed_batch``) in ONE
    atomic manifest swap, so a replayed batch — Spark re-runs
    foreachBatch with the same batch_id after a failure between sink
    completion and checkpoint advance — is detected and SKIPPED instead
    of duplicated. Returns the sink callable for
    ``writeStream.foreachBatch``; pair it with a checkpointLocation.

    Scale: the dedup check is one manifest property read (no data
    scan); the commit cost is the manifest rename. State never grows:
    exactly one integer records progress.
    """

    def sink(batch_df, batch_id: int):
        last = table.properties().get("last_committed_batch", -1)
        if batch_id <= last:
            return  # replay of an already-committed epoch: exactly-once
        table.write(
            batch_df,
            mode=mode,
            _op="stream",
            props={"last_committed_batch": batch_id},
        )

    return sink


def stream_to_tableio(
    stream: DataFrame, table, checkpoint: str, mode: str = "append"
):
    """Wire a streaming DataFrame into :func:`tableio_sink` with
    availableNow draining; returns the started query."""
    return (
        stream.writeStream.foreachBatch(tableio_sink(table, mode=mode))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_gapfill_locf(
    stream: DataFrame,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    mode: str = "locf",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    continuous gap-fill — the streaming form of the batch
    ``gapfill_locf``/``gapfill_linear`` grid queries, per-user semantics
    (R12 as a stream). ``mode='locf'`` carries the last observation
    forward; ``mode='linear'`` interpolates interior gaps between the
    neighbouring hourly means with the batch query's exact float tree
    (ratio of integer hour offsets, +1e-9 boundary nudge, HALF_UP
    round to 4 — every interior hour has both neighbours by
    construction, so no LOCF fallback arm is ever taken).

    Per user the state accumulates hourly (sum, count) pairs as
    micro-batches fold in; an EVENT-TIME timeout fires once the
    watermark passes the user's last observed hour, at which point the
    user emits their complete filled series exactly once — the hourly
    grid from their FIRST to their LAST observed hour with hourly means
    where data exists and the last observation carried forward across
    interior gaps (no leading NULLs, no unbounded trailing fill: the
    well-defined per-user window). Append semantics; late rows beyond
    the watermark never reach the operator.

    Bounded state: one (int64, float64, int64) triple per DISTINCT
    observed hour per user — days of data are a few hundred triples.
    Means round HALF_UP to 4 decimals exactly like the batch query's
    ``F.round``, so the drained stream equals the per-user batch SQL
    (the ``stream_gapfill_locf`` registry oracle)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.date_trunc("hour", F.col(ts_col)).alias("h"),
        F.col(value_col).cast("double").alias("v"),
        F.col(ts_col).alias("_ts"),
    ).withWatermark("_ts", watermark)

    hour_us = 3_600_000_000

    def _round4_half_up(x: float) -> float:
        import math

        s = -1.0 if x < 0 else 1.0
        return s * math.floor(abs(x) * 10_000.0 + 0.5) / 10_000.0

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            hours, sums, cnts = state.get
            state.remove()
            order = np.argsort(np.asarray(hours, dtype=np.int64))
            hs = [int(hours[i]) for i in order]
            means = {
                h: _round4_half_up(float(sums[i]) / float(cnts[i]))
                for h, i in zip(hs, order)
            }
            grid = list(range(hs[0], hs[-1] + hour_us, hour_us))
            out_h, out_v = [], []
            if mode == "linear":
                nxt = 0  # index of the next observed hour >= g
                for g in grid:
                    if g in means:
                        v = _round4_half_up(means[g] + 1e-9)
                        nxt += 1
                    else:
                        hp, hn = hs[nxt - 1], hs[nxt]
                        vp, vn = means[hp], means[hn]
                        # the batch oracle's tree: vp + (vn-vp)*ratio
                        v = _round4_half_up(
                            vp
                            + (vn - vp) * (float(g - hp) / float(hn - hp))
                            + 1e-9
                        )
                    out_h.append(g)
                    out_v.append(v)
            else:
                last = None
                for g in grid:
                    if g in means:
                        last = means[g]
                    out_h.append(g)
                    out_v.append(last)
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(grid), uid, dtype=np.int64),
                    "hour": pd.to_datetime(np.asarray(out_h), unit="us"),
                    "v_locf": np.asarray(out_v, dtype=np.float64),
                }
            )
            return
        if state.exists:
            hours, sums, cnts = state.get
            acc = {
                int(h): (float(s), int(c))
                for h, s, c in zip(hours, sums, cnts)
            }
        else:
            acc = {}
        for pdf in pdfs:
            # pin the resolution explicitly: pandas may hand Arrow
            # timestamps back as [ns] or [us] depending on version
            hus = pdf["h"].astype("datetime64[us]").astype("int64")
            for h, v in zip(hus, pdf["v"]):
                s, c = acc.get(int(h), (0.0, 0))
                acc[int(h)] = (s + float(v), c + 1)
        hours = sorted(acc)
        state.update(
            (
                [int(h) for h in hours],
                [acc[h][0] for h in hours],
                [int(acc[h][1]) for h in hours],
            )
        )
        # fire once the watermark passes the last observed hour's end
        end_ms = (hours[-1] + hour_us) // 1000
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — make fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, hour timestamp, v_locf double",
        stateStructType=(
            "hours array<long>, sums array<double>, cnts array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_rate_cusum(
    stream: DataFrame,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user CUSUM change detection on INTER-ARRIVAL GAPS — "did this
    user's event rate change, and when" — kept entirely in integer
    microseconds so the Python state fold is BIT-EXACT against the
    batch SQL oracle (no float accumulation anywhere).

    For gaps g_1..g_m with prefix sums C_i and total G, the classic
    CUSUM deviation S_i = C_i − i·Ḡ is scaled by m to stay integral:
    T_i = m·C_i − i·G (int64; m ≤ a few hundred, C ≤ 1e12 ⇒ |T| ≤ 1e15,
    safely inside int64).  The emitted changepoint is argmax |T_i| over
    the interior splits i = 1..m−1, ties to the smallest i, plus the
    scale-free deviation ratio |T_max|/(m·G) (ONE float division).

    State per user is the observed (tu, event_id) list — bounded by the
    per-user event count in the drained window (a production deployment
    windows the key exactly like the DBA tier); the event-time timeout
    fires once the watermark passes the user's last event, emitting one
    verdict row per user exactly once (append mode)."""
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            tus, eids = state.get
            state.remove()
            pairs = sorted(zip(tus, eids))
            if len(pairs) >= 3:
                t = np.asarray([p[0] for p in pairs], dtype=np.int64)
                g = np.diff(t)  # m = len(pairs) - 1 gaps, int64
                m = len(g)
                c = np.cumsum(g)  # exact int64 prefix sums
                total = int(c[-1])
                i = np.arange(1, m, dtype=np.int64)  # interior splits
                T = m * c[:-1] - i * total
                k = int(np.argmin(-np.abs(T)))  # first max |T|
                t_max = int(abs(T[k]))
                yield pd.DataFrame(
                    {
                        "user_id": [int(uid)],
                        "n_events": [m + 1],
                        "cp_gap_index": [k + 1],
                        "t_max": [t_max],
                        "total_span_us": [total],
                        # HALF_UP spelled manually (floor(x*1e4+0.5))
                        # so Python and the SQL oracle round the
                        # identical double identically (Python round()
                        # is half-EVEN — a silent boundary mismatch)
                        "dev_ratio": [
                            math.floor(
                                t_max / float(m * total) * 10000.0 + 0.5
                            )
                            / 10000.0
                            if total > 0
                            else 0.0
                        ],
                    }
                )
            return
        tus, eids = (state.get if state.exists else ([], []))
        tus, eids = list(tus), list(eids)
        for pdf in pdfs:
            tus.extend(int(x) for x in pdf["tu"])
            eids.extend(int(x) for x in pdf["eid"])
        state.update((tus, eids))
        end_ms = max(tus) // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_events long, cp_gap_index long, t_max long,"
            " total_span_us long, dev_ratio double"
        ),
        stateStructType="tus array<long>, eids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_counter_agg(
    stream: DataFrame,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 5th): TimescaleDB-style reset-aware ``counter_agg`` maintained
    in real time — per user, treat the value stream as a monotone
    counter with resets (a drop below the previous sample means the
    counter restarted; the previous sample's level is added to the
    running reset base), and emit the corrected first/last levels,
    delta, and reset count once the watermark closes the user.

    EXACTNESS: the 2-decimal event values are integerized to cents on
    the JVM side (``floor(value·100 + 0.5)`` — exact for 2-dp doubles),
    so the entire fold — reset detection, cumulative base, corrected
    levels, delta — is int64 arithmetic with NO float accumulation,
    and the emitted rows equal the batch window-SQL re-derivation
    bit-for-bit in any engine.

    State per user is the observed (tu, eid, cents) list (bounded by
    the per-user event count in the drained window; production windows
    the key like the DBA tier); event-time timeout emits one row per
    user exactly once (append mode).

    ref:timescaledb-toolkit counter_agg (public semantics: delta =
    corrected(last) − corrected(first), resets counted at drops).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
        F.col(id_col).cast("long").alias("eid"),
        F.expr(f"CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            tus, eids, vals = state.get
            state.remove()
            rows = sorted(zip(tus, eids, vals))
            if rows:
                base = 0
                resets = 0
                prev = None
                first = None
                last = None
                for _, _, v in rows:
                    if prev is not None and v < prev:
                        base += prev
                        resets += 1
                    corrected = v + base
                    if first is None:
                        first = corrected
                    last = corrected
                    prev = v
                yield pd.DataFrame(
                    {
                        "user_id": [int(uid)],
                        "n_samples": [len(rows)],
                        "n_resets": [resets],
                        "first_cents": [first],
                        "last_cents": [last],
                        "delta_cents": [last - first],
                    }
                )
            return
        tus, eids, vals = (state.get if state.exists else ([], [], []))
        tus, eids, vals = list(tus), list(eids), list(vals)
        for pdf in pdfs:
            tus.extend(int(x) for x in pdf["tu"])
            eids.extend(int(x) for x in pdf["eid"])
            vals.extend(int(x) for x in pdf["cents"])
        state.update((tus, eids, vals))
        end_ms = max(tus) // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_samples long, n_resets long,"
            " first_cents long, last_cents long, delta_cents long"
        ),
        stateStructType=(
            "tus array<long>, eids array<long>, vals array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_sdt(
    stream: DataFrame,
    tol: float = 5.0,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 6th): swinging-door trending compression AS A STREAM — the
    deployment shape a process historian actually runs: raw points
    flow in, the archived (kept) points flow out exactly once when the
    watermark closes the series.

    The state is the user's (tu, value) buffer (bounded by the per-key
    event count in the drained window — a production deployment
    windows the key exactly like the DBA tier, committing each closed
    door segment as its own key); on event-time timeout the EXACT
    batch kernel (``functions.sdt.swinging_door`` — greedy doors +
    the unconditional verify-split tolerance pass) runs over the
    sorted buffer, so the emitted point set equals the batch E4
    operator row for row, including the reconstruction-error
    guarantee."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from dtaidistance_spark.functions.sdt import swinging_door

    keyed = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
        F.col(value_col).cast("double").alias("v"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            tus, vals = state.get
            state.remove()
            pairs = sorted(zip(tus, vals))
            if pairs:
                x = [p[0] / 1e6 for p in pairs]  # seconds, as batch E4
                y = [p[1] for p in pairs]
                kept = swinging_door(x, y, tol)
                yield pd.DataFrame(
                    {
                        "user_id": [int(uid)] * len(kept),
                        "idx": list(range(len(kept))),
                        "tu": [int(pairs[j][0]) for j in kept],
                        "value": [float(pairs[j][1]) for j in kept],
                    }
                )
            return
        tus, vals = (state.get if state.exists else ([], []))
        tus, vals = list(tus), list(vals)
        for pdf in pdfs:
            tus.extend(int(x) for x in pdf["tu"])
            vals.extend(float(x) for x in pdf["v"])
        state.update((tus, vals))
        end_ms = max(tus) // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, idx int, tu long, value double",
        stateStructType="tus array<long>, vals array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_uddq_sketch(
    stream: DataFrame,
    watermark: str = "30 minutes",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 7th): real-time UddSketch-analog quantile-sketch MAINTENANCE —
    per event type, the T32 log-bucket histogram kept incrementally as
    the stream arrives.  Unlike the CUSUM/counter kernels (whose state
    is the raw event buffer), the state here IS the sketch: the
    (bucket idx → count) map, bounded by the number of touched buckets
    (≤ ~8·64) regardless of stream length — the property that makes
    sketch maintenance deployable on unbounded streams.

    Values are integerized to cents JVM-side (floor(100·v + 0.5) —
    exact for 2-dp inputs, the stream_counter_agg precedent), and the
    bucket index is T32's sub-bucket-of-8 integer log index, computed
    in Python via bit_length — bit-identical to the SQL
    ``length(bin(t))`` spelling.  Bucket counts are ORDER-FREE int64
    sums, so the emitted rows equal the batch GROUP BY exactly however
    the stream is micro-batched — the same argument that makes the
    sketch mergeable across partitions.

    Emits one (event_type, idx, cnt) row per touched bucket, exactly
    once, on event-time timeout (append mode)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(type_col).alias("event_type"),
        F.expr(
            f"CAST(floor(100.0 * {value_col} + CAST(0.5 AS DOUBLE))"
            f" AS BIGINT)"
        ).alias("cents"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    def _idx(v: int) -> int:
        # python mirror of the T32 index: length(bin(v)) == bit_length
        if v < 8:
            return v
        L = v.bit_length()
        return (L - 1) * 8 + ((v >> (L - 4)) & 7)

    def fn(key, pdfs, state):
        (etype,) = key
        if state.hasTimedOut:
            idxs, cnts = state.get
            state.remove()
            if len(idxs):
                yield pd.DataFrame(
                    {
                        "event_type": [etype] * len(idxs),
                        "idx": [int(i) for i in idxs],
                        "cnt": [int(c) for c in cnts],
                    }
                )
            return
        if state.exists:
            idxs, cnts = state.get
            sk = dict(zip(idxs, cnts))
        else:
            sk = {}
        last_ms = 0
        for pdf in pdfs:
            for v in pdf["cents"]:
                i = _idx(int(v))
                sk[i] = sk.get(i, 0) + 1
            if len(pdf):
                last_ms = max(
                    last_ms, int(pdf["_ts"].max().timestamp() * 1000)
                )
        items = sorted(sk.items())
        state.update(
            ([i for i, _ in items], [c for _, c in items])
        )
        state.setTimeoutTimestamp(
            max(last_ms + 1, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType="event_type string, idx long, cnt long",
        stateStructType="idxs array<long>, cnts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_page_hinkley(
    stream: DataFrame,
    watermark: str = "30 minutes",
    delta_cents: int = 25,
    lam_cents: int = 25000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 8th): per-user PAGE-HINKLEY mean-drift detection on event
    VALUES (Page Biometrika'54; the data-stream formulation per Gama
    et al.'s drift-detection survey) — "did this user's spend level
    drift UP, when did the drift peak, and when did it first cross the
    alarm bar".  The complement of ``stream_rate_cusum``: CUSUM reads
    the event RATE via inter-arrival gaps; PH reads the event VALUE
    level with a tolerance δ.

    Exact integer state: values → cents (int64), and the PH statistic
    is cleared by n so the running mean never divides:

        m_t = n·C_t − t·C_n − t·n·δ          (int64; |m| ≤ n²·maxc)
        PH  = max_t (m_t − min_{i≤t} m_i)    (the drawup)

    alarm when PH > n·λ (the cleared form of raw-PH > λ).  Emitted
    once per user on event-time timeout: n_events, ph_stat, t_peak
    (FIRST argmax, 1-indexed), alarm flag, t_alarm (first bar
    crossing; 0 when no alarm — 1-indexed positions make 0 a safe
    sentinel, keeping the output column non-nullable across the
    Arrow hop).

    This retrospective window form shares R30's calibration choice:
    the reference mean is the drained window's own mean (exact
    integers), where the textbook online PH tracks a running mean —
    declared; a production deployment would window the key exactly
    like the DBA tier."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
        F.col(id_col).cast("long").alias("eid"),
        F.expr(
            f"CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT)"
        ).alias("cents"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            tus, eids, cs = state.get
            state.remove()
            order = sorted(range(len(tus)), key=lambda k: (tus[k], eids[k]))
            x = np.asarray([cs[k] for k in order], dtype=np.int64)
            n = len(x)
            if n >= 3:
                c = np.cumsum(x)
                cn = int(c[-1])
                t = np.arange(1, n + 1, dtype=np.int64)
                m = n * c - t * cn - t * n * int(delta_cents)
                gap = m - np.minimum.accumulate(m)
                ph = int(gap.max())
                t_peak = int(np.argmax(gap)) + 1
                bar = n * int(lam_cents)
                over = np.nonzero(gap > bar)[0]
                yield pd.DataFrame(
                    {
                        "user_id": [int(uid)],
                        "n_events": [n],
                        "ph_stat": [ph],
                        "t_peak": [t_peak],
                        "alarm": [1 if ph > bar else 0],
                        "t_alarm": [int(over[0]) + 1 if len(over) else 0],
                    }
                )
            return
        tus, eids, cs = (state.get if state.exists else ([], [], []))
        tus, eids, cs = list(tus), list(eids), list(cs)
        for pdf in pdfs:
            tus.extend(int(v) for v in pdf["tu"])
            eids.extend(int(v) for v in pdf["eid"])
            cs.extend(int(v) for v in pdf["cents"])
        state.update((tus, eids, cs))
        end_ms = max(tus) // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_events long, ph_stat long, t_peak long,"
            " alarm long, t_alarm long"
        ),
        stateStructType=(
            "tus array<long>, eids array<long>, cs array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_kmv(
    stream: DataFrame,
    watermark: str = "30 minutes",
    k: int = 64,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 9th): KMV / theta DISTINCT sketch per key maintained
    incrementally (Bar-Yossef et al. RANDOM'02; the theta-sketch
    bottom-k form) — the streaming twin of the batch ``kmv_distinct``
    (T-series).  State is the sorted bottom-k DISTINCT 60-bit md5
    hashes of the value cents — bounded by k, NOT by stream length —
    and because bottom-k-of-a-set is order-free, the emitted
    (theta, estimate) rows are BIT-EQUAL to the batch re-derivation
    however the stream is micro-batched: this stateful operator is
    fully oracled.

    The hash is computed JVM-side in the keyed projection (md5 → first
    15 hex chars → BIGINT, the portable-hash twin convention,
    FIXTURES.md) so Python never hashes; the state fold only set-unions
    and truncates.  Emitted once per key on event-time timeout:
    k_kept, theta = k-th smallest hash, and the classic estimator
    (k−1)·2⁶⁰/θ (exact count when fewer than k distinct seen),
    HALF_UP-floored at 1e-6 exactly like the SQL oracle."""
    import math

    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(key_col).alias("k"),
        F.expr(
            f"CAST(conv(substring(md5(CAST(CAST(floor(100.0 * {value_col}"
            f" + 0.5) AS BIGINT) AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("hv"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    two60 = 1 << 60

    def fn(key, pdfs, state):
        (kk,) = key
        if state.hasTimedOut:
            (kept,) = state.get
            state.remove()
            kept = sorted(kept)
            n = len(kept)
            if n:
                theta = kept[-1] if n < k else kept[k - 1]
                est = (
                    float(n)
                    if n < k
                    else (k - 1.0) * float(two60) / float(theta)
                )
                yield pd.DataFrame(
                    {
                        "event_type": [kk],
                        "k_kept": [n],
                        "theta": [int(theta)],
                        "kmv_estimate": [
                            math.floor(est * 1e6 + 0.5) / 1e6
                        ],
                    }
                )
            return
        (kept,) = (state.get if state.exists else ([],))
        s = set(int(h) for h in kept)
        last_ms = 0
        for pdf in pdfs:
            s.update(int(h) for h in pdf["hv"])
            if len(pdf):
                last_ms = max(
                    last_ms, int(pdf["_ts"].max().timestamp() * 1000)
                )
        kept = sorted(s)[:k]
        state.update((kept,))
        state.setTimeoutTimestamp(
            max(last_ms + 1, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=(
            "event_type string, k_kept long, theta long,"
            " kmv_estimate double"
        ),
        stateStructType="kept array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_ses_level(
    stream: DataFrame,
    watermark: str = "30 minutes",
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 10th): per-key simple-exponential-smoothing LEVEL monitoring on
    event-value cents (α = 0.2; TS81's batch semantics) — the streaming
    twin of the forecast family: what a live rollup pipeline runs to
    keep a smoothed level + one-step error score per metric as events
    arrive.

    A SEQUENTIAL recursion is order-sensitive, so bit-exactness across
    arbitrary micro-batching uses the R42 Page-Hinkley posture: state
    BUFFERS the key's (ts, event_id, cents) triples (bounded by the
    key's window, not the stream — declared), and the drain sorts by
    (ts, event_id) and runs the exact fold, so the emitted doubles are
    independent of how files were replayed.  The numpy fold mirrors the
    batch SQL fold op-for-op (e = x − l; sse += e·e; l = 0.2·x + 0.8·l
    — identical IEEE trees), so the drained rows hash-match the DuckDB
    ordered-array re-derivation: fully oracled.

    Emitted once per key on event-time timeout: n_events, the SES
    one-step sse/sae and final level (floor-1e6), and the naive Σ|Δ|
    benchmark with the MASE verdict."""
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
        F.col(id_col).cast("long").alias("eid"),
        F.expr(
            f"CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT)"
        ).alias("cents"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731

    def fn(key, pdfs, state):
        (kk,) = key
        if state.hasTimedOut:
            tus, eids, cs = state.get
            state.remove()
            order = sorted(range(len(tus)), key=lambda i: (tus[i], eids[i]))
            x = np.asarray([cs[i] for i in order], dtype=np.int64)
            n = len(x)
            if n >= 3:
                l = float(x[0])
                sse = sae = 0.0
                for t in range(1, n):
                    y = float(x[t])
                    e = y - l
                    sse += e * e
                    sae += abs(e)
                    l = 0.2 * y + 0.8 * l
                sad = int(np.abs(np.diff(x).astype(object)).sum())
                yield pd.DataFrame(
                    {
                        "event_type": [kk],
                        "n_events": [n],
                        "sad": [sad],
                        "ses_sse": [f6(sse)],
                        "ses_sae": [f6(sae)],
                        "final_level": [f6(l)],
                        "mase": [f6(sae / sad) if sad > 0 else None],
                    }
                )
            return
        tus, eids, cs = (state.get if state.exists else ([], [], []))
        tus, eids, cs = list(tus), list(eids), list(cs)
        for pdf in pdfs:
            tus.extend(int(v) for v in pdf["tu"])
            eids.extend(int(v) for v in pdf["eid"])
            cs.extend(int(v) for v in pdf["cents"])
        state.update((tus, eids, cs))
        end_ms = max(tus) // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=(
            "event_type string, n_events long, sad long, ses_sse double,"
            " ses_sae double, final_level double, mase double"
        ),
        stateStructType=(
            "tus array<long>, eids array<long>, cs array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_scd2_tiers(
    stream: DataFrame,
    watermark: str = "30 minutes",
    lo: int = 12,
    hi: int = 18,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    live SCD Type-2 dimension maintenance — the streaming twin of
    R55's batch ``scd2_user_tiers``.  State per user is the map of
    calendar week → event count (bounded by the observation window:
    ≤ 5 entries per key); the event-time timeout fires once the
    watermark passes the user's last event, at which point the runs
    are derived with EXACTLY the batch semantics (absence breaks a
    run; tier thresholds lo/hi on the weekly count) and emitted once
    (append mode).  Every derived quantity is integer, so the
    streaming rows are bit-identical to the batch operator's — the
    registry query's oracle IS the R55 oracle.

    The week-count merge is commutative and associative across
    micro-batches, so the emitted dimension is independent of file
    replay order — gated by the maxFilesPerTrigger=1 replay."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.expr("CAST((day(ts) - 1) DIV 7 AS BIGINT)").alias("week"),
        F.col("ts").cast("timestamp").alias("_ts"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
    ).withWatermark("_ts", watermark)

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            weeks, cnts, _tu_max = state.get
            state.remove()
            per = dict(zip([int(w) for w in weeks], [int(c) for c in cnts]))
            rows = []
            run = None  # [tier, eff_from, eff_to]
            prev_w = None
            for w in sorted(per):
                n_ev = per[w]
                tier = "LOW" if n_ev < lo else ("MID" if n_ev < hi else "HIGH")
                if run is None or tier != run[0] or w != prev_w + 1:
                    if run:
                        rows.append(run)
                    run = [tier, w, w]
                else:
                    run[2] = w
                prev_w = w
            if run:
                rows.append(run)
            if rows:
                yield pd.DataFrame(
                    {
                        "user_id": [int(uid)] * len(rows),
                        "tier": [r[0] for r in rows],
                        "eff_from": [r[1] for r in rows],
                        "eff_to": [r[2] for r in rows],
                        "n_weeks": [r[2] - r[1] + 1 for r in rows],
                    }
                )
            return
        if state.exists:
            weeks, cnts, tu_max = state.get
            per = dict(zip([int(w) for w in weeks], [int(c) for c in cnts]))
            tu_max = int(tu_max)
        else:
            per = {}
            tu_max = 0
        # tu_max is the ACCUMULATED max observed event time (carried in
        # state, like stream_rate_cusum's max(tus)) — deriving it from
        # only the current micro-batch would let an out-of-order replay
        # degrade the timeout to watermark+1 and close a user's run
        # while in-slack events are still queued, fragmenting the
        # emitted dimension.
        for pdf in pdfs:
            tu_max = max(tu_max, int(pdf["tu"].max()))
            for w in pdf["week"]:
                per[int(w)] = per.get(int(w), 0) + 1
        weeks = sorted(per)
        state.update(
            ([int(w) for w in weeks], [per[w] for w in weeks], int(tu_max))
        )
        end_ms = tu_max // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, tier string, eff_from long, eff_to long,"
            " n_weeks long"
        ),
        stateStructType=(
            "weeks array<long>, cnts array<long>, tu_max long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_hampel_despike(
    stream: DataFrame,
    watermark: str = "30 minutes",
    half: int = 5,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``,
    the 12th): per-user Hampel despiking of the value stream — TS22's
    batch semantics (centered 11-row frame under the (tu, value,
    event_id) total order, positional LOWER median and two-pass MAD,
    spike at |x − med| > 3·1.4826·MAD) maintained live.

    A centered-window filter is order-sensitive on BOTH sides of each
    point, so the R42/R51 buffered-sort posture applies: state buffers
    the user's (tu, event_id, value) triples (bounded by the user's
    window, not the stream — declared), and the event-time-timeout
    drain sorts and runs the exact frame algebra in numpy — positional
    picks and single-op float expressions only, so the drained rows
    are BIT-IDENTICAL to the batch ``hampel_filter`` operator and the
    same DuckDB oracle covers both (fully oracled, the stream_ses
    pattern)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        F.col("event_id").cast("long").alias("eid"),
        F.col("value").cast("double").alias("val"),
        F.col("ts").cast("timestamp").alias("_ts"),
    ).withWatermark("_ts", watermark)

    k_sigma = 3.0 * 1.4826  # the batch operator's literal product

    def fn(key, pdfs, state):
        (uid,) = key
        if state.hasTimedOut:
            tus, eids, vals = state.get
            state.remove()
            rows = sorted(zip(tus, eids, vals), key=lambda r: (r[0], r[2], r[1]))
            n = len(rows)
            tu_a = [r[0] for r in rows]
            eid_a = [r[1] for r in rows]
            v = [float(r[2]) for r in rows]
            meds, frame_ns = [], []
            for i in range(n):
                fr = sorted(v[max(0, i - half) : min(n, i + half + 1)])
                frame_ns.append(len(fr))
                meds.append(fr[(len(fr) + 1) // 2 - 1])
            mads, devs_out = [], []
            for i in range(n):
                dv = sorted(
                    abs(v[j] - meds[j])
                    for j in range(max(0, i - half), min(n, i + half + 1))
                )
                mads.append(dv[(len(dv) + 1) // 2 - 1])
                devs_out.append(abs(v[i] - meds[i]))
            yield pd.DataFrame(
                {
                    "event_id": eid_a,
                    "user_id": [int(uid)] * n,
                    "tu": tu_a,
                    "value": v,
                    "frame_n": frame_ns,
                    "med": meds,
                    "mad": mads,
                    "dev": devs_out,
                    "is_spike": [
                        devs_out[i] > k_sigma * mads[i] for i in range(n)
                    ],
                }
            )
            return
        tus, eids, vals = (state.get if state.exists else ([], [], []))
        tus, eids, vals = list(tus), list(eids), list(vals)
        for pdf in pdfs:
            tus.extend(int(x) for x in pdf["tu"])
            eids.extend(int(x) for x in pdf["eid"])
            vals.extend(float(x) for x in pdf["val"])
        state.update((tus, eids, vals))
        end_ms = max(tus) // 1000 + 1
        state.setTimeoutTimestamp(
            max(end_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keep fn a generator on every path

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "event_id long, user_id long, tu long, value double,"
            " frame_n int, med double, mad double, dev double,"
            " is_spike boolean"
        ),
        stateStructType=(
            "tus array<long>, eids array<long>, vals array<double>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
