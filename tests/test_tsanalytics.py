"""Behavior gates for the timeseries-analytics batch (tsanalytics_q):
numpy recompute parity for ACF and EWMA (the oracle proves cross-engine
bit-identity; these prove the STATISTIC is the right one), seasonality
recovery of the generator's planted period-64 component, CUSUM
localization of the injected level shift, and the KMV sketch error
bound that the estimator's k=256 accuracy theory promises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators import tsanalytics_q  # noqa: F401
from dtaidistance_spark.operators.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _tokens(i: int) -> np.ndarray:
    return np.asarray(synth.gen_row(i)[1], dtype=np.int64)


# ---------------------------------------------------------------------------
# ACF == the textbook estimator (and bitwise == the shared-tree spelling)
# ---------------------------------------------------------------------------


def _acf_ref(x: np.ndarray, k: int) -> float:
    mu = x.sum() / len(x)
    num = float(((x[:-k] - mu) * (x[k:] - mu)).sum())
    den = float(((x - mu) ** 2).sum())
    return num / den


def test_acf_matches_numpy(spark):
    out = REGISTRY["acf_per_series"](spark, SF)
    rows = {
        (r["doc_id"], r["lag"]): r["acf"]
        for r in out.where(out.doc_id.isin("doc000000000003", "doc000000000017")).collect()
    }
    for i in (3, 17):
        x = _tokens(i)
        for k in (1, 2, 4, 8, 16, 32, 64):
            if k >= len(x):
                continue
            got = rows[(f"doc{i:012d}", k)]
            assert got == pytest.approx(_acf_ref(x, k), abs=1e-9)


def test_seasonality_argmax_consistent(spark):
    """seasonality_detect must be exactly the (acf DESC, lag ASC)
    argmax of acf_per_series, row for row. (The planted period-64
    sinusoid is NOT the dominant lag for most docs — the modular token
    ramp autocorrelates harder at short lags — but a deterministic
    minority does surface it, which the last assert pins.)"""
    acf = REGISTRY["acf_per_series"](spark, SF).collect()
    best: dict[str, tuple] = {}
    for r in acf:
        key = (-r["acf"], r["lag"])
        if r["doc_id"] not in best or key < best[r["doc_id"]][0]:
            best[r["doc_id"]] = (key, r["lag"], r["acf"])
    out = REGISTRY["seasonality_detect"](spark, SF).collect()
    assert len(out) == 256 and len(best) == 256
    for r in out:
        _, lag, val = best[r["doc_id"]]
        assert (r["best_lag"], r["best_acf"]) == (lag, val)
    assert sum(1 for r in out if r["best_lag"] == 64) > 0


# ---------------------------------------------------------------------------
# EWMA == exact Python left fold, bit-for-bit
# ---------------------------------------------------------------------------


def test_ewma_bitwise_fold_parity(spark):
    out = REGISTRY["ewma_smooth"](spark, SF)
    rows = {r["doc_id"]: r for r in out.where(
        out.doc_id.isin("doc000000000000", "doc000000000042")).collect()}
    for i in (0, 42):
        x = _tokens(i).astype(np.float64)
        sh = float(x[0])
        sq = float(x[0])
        for v in x[1:]:
            sh = (sh + float(v)) / 2.0
            sq = sq + ((float(v) - sq) / 4.0)
        r = rows[f"doc{i:012d}"]
        assert struct.pack("<d", r["ewma_half"]) == struct.pack("<d", sh)
        assert struct.pack("<d", r["ewma_quarter"]) == struct.pack("<d", sq)


# ---------------------------------------------------------------------------
# CUSUM: the injected +20000 second-half shift must localize at n/2
# ---------------------------------------------------------------------------


def test_cusum_localizes_planted_shift(spark):
    out = REGISTRY["cusum_changepoint"](spark, SF).collect()
    assert len(out) == 128
    inj = [r for r in out if r["injected"]]
    assert len(inj) > 0
    for r in inj:
        n = r["n_tok"]
        # shift (+20000) vs uniform-token std (~14500): localization
        # error is a few samples, independent of n — allow a modest
        # slack that still pins the argmax to the plant boundary
        assert abs(r["cp_pos"] - n // 2) <= max(10, n // 20), r
    # statistic scale check on one clean doc: recompute directly
    clean = next(r for r in out if not r["injected"])
    i = int(clean["doc_id"][3:])
    x = _tokens(i)
    n = len(x)
    cums = np.cumsum(x)
    stats = np.abs(n * cums[:-1] - np.arange(1, n) * cums[-1])
    assert clean["stat"] == int(stats.max())
    assert clean["cp_pos"] == int(np.argmax(stats)) + 1


# ---------------------------------------------------------------------------
# KMV: estimator accuracy within theory (RSE ~ 1/sqrt(k-2) ~ 6.3%)
# ---------------------------------------------------------------------------


def test_kmv_error_bound(spark):
    rows = {r["source"]: r for r in REGISTRY["kmv_distinct"](spark, SF).collect()}
    assert set(rows) == {"web", "code", "books"}
    for r in rows.values():
        rel = abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 0.2, r


def test_kmv_set_ops_sane(spark):
    r = REGISTRY["kmv_set_ops"](spark, SF).collect()[0]
    # union >= each set, intersection <= min; estimates within 20%
    assert r["exact_inter"] <= r["exact_union"]
    for est, exact in (
        (r["est_union"], r["exact_union"]),
        (r["est_inter"], r["exact_inter"]),
    ):
        assert abs(est - exact) / exact < 0.2, r


# ---------------------------------------------------------------------------
# Hyperfunctions (tshyper_q)
# ---------------------------------------------------------------------------


def test_holt_bitwise_fold_parity(spark):
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    out = REGISTRY["holt_smooth"](spark, SF)
    rows = {r["doc_id"]: r for r in out.where(
        out.doc_id.isin("doc000000000001", "doc000000000050")).collect()}
    for i in (1, 50):
        x = _tokens(i).astype(np.float64)
        l, b = float(x[0]), 0.0
        for v in x[1:]:
            l2 = (float(v) + (l + b)) / 2.0
            b = (b + (l2 - l)) / 2.0
            l = l2
        r = rows[f"doc{i:012d}"]
        assert struct.pack("<d", r["level"]) == struct.pack("<d", l)
        assert struct.pack("<d", r["trend"]) == struct.pack("<d", b)
        assert struct.pack("<d", r["forecast1"]) == struct.pack("<d", l + b)


def test_holt_winters_bitwise_fold_parity(spark):
    """TS17: the 10-state [level, trend, s1..s8] recursion at period 8,
    alpha=beta=gamma=1/2, replayed in pure python with the exact IEEE op
    order of the SQL fold — every output double must be bit-identical."""
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    out = REGISTRY["holt_winters_smooth"](spark, SF)
    rows = {r["doc_id"]: r for r in out.where(
        out.doc_id.isin("doc000000000001", "doc000000000050")).collect()}
    for i in (1, 50):
        x = _tokens(i).astype(np.float64)
        l0 = float(int(x[:8].sum())) / 8.0  # int64 sum then one /8, exact
        l, b = l0, 0.0
        season = [float(v) - l0 for v in x[:8]]  # s applies to NEXT obs
        for v in x[8:]:
            l2 = ((float(v) - season[0]) + (l + b)) / 2.0
            b = (b + (l2 - l)) / 2.0
            s_new = ((float(v) - l2) + season[0]) / 2.0
            season = season[1:] + [s_new]
            l = l2
        r = rows[f"doc{i:012d}"]
        assert struct.pack("<d", r["level"]) == struct.pack("<d", l)
        assert struct.pack("<d", r["trend"]) == struct.pack("<d", b)
        assert struct.pack("<d", r["forecast1"]) == struct.pack(
            "<d", l + b + season[0])
        for k in range(8):
            assert struct.pack("<d", r[f"s{k + 1}"]) == struct.pack(
                "<d", season[k]), (i, k)


def test_twa_hand_case(spark, tmp_path):
    """value 0 held for 3s then 12 held for 1s -> twa = (0*3 + 12*1)/4 = 3."""
    from datetime import datetime

    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), "error", 0.0, "{}"),
        (2, 1, datetime(2024, 1, 1, 0, 0, 3), "error", 12.0, "{}"),
        (3, 1, datetime(2024, 1, 1, 0, 0, 4), "error", 99.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    out = REGISTRY["time_weighted_avg"](spark, p).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 3 and r["span_us"] == 4_000_000
    assert r["twa"] == 3.0  # last point's value never weighs in (LOCF)


def test_ohlc_hand_case(spark, tmp_path):
    """Open/close follow the (ts, event_id) total order, including a
    microsecond tie broken by event_id; high/low/volume are order-free."""
    from datetime import datetime

    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    t0 = datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        # same timestamp for events 2 and 1 -> open must be event 1's value
        (2, 1, t0, "trade", 50.0, "{}"),
        (1, 1, t0, "trade", 10.0, "{}"),
        (3, 1, datetime(2024, 3, 1, 10, 0, 0), "trade", 99.0, "{}"),
        (4, 1, datetime(2024, 3, 1, 11, 0, 0), "trade", 7.0, "{}"),
        # a second day-bucket
        (5, 1, datetime(2024, 3, 2, 9, 0, 0), "trade", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    out = {
        r["bucket"].day: r
        for r in REGISTRY["ohlc_candlestick"](spark, p).collect()
    }
    d1 = out[1]
    assert d1["open"] == 10.0  # tie on ts -> lower event_id wins
    assert d1["close"] == 7.0 and d1["high"] == 99.0 and d1["low"] == 7.0
    assert d1["n_events"] == 4 and d1["volume"] == 166.0
    d2 = out[2]
    assert d2["open"] == d2["close"] == d2["high"] == d2["low"] == 3.0


def test_state_durations_hand_case(spark, tmp_path):
    """A->A->B->A: state A is entered twice (start + return), holds for
    the two leading seconds plus nothing after the last event; B holds
    for exactly one second."""
    from datetime import datetime

    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    rows = [
        (1, 7, datetime(2024, 1, 1, 0, 0, 0), "A", 0.0, "{}"),
        (2, 7, datetime(2024, 1, 1, 0, 0, 1), "A", 0.0, "{}"),
        (3, 7, datetime(2024, 1, 1, 0, 0, 2), "B", 0.0, "{}"),
        (4, 7, datetime(2024, 1, 1, 0, 0, 3), "A", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    out = {
        r["state"]: r
        for r in REGISTRY["state_durations"](spark, p).collect()
    }
    assert out["A"]["n_events"] == 3 and out["A"]["n_entries"] == 2
    assert out["A"]["duration_us"] == 2_000_000  # trailing A holds nothing
    assert out["B"]["n_events"] == 1 and out["B"]["n_entries"] == 1
    assert out["B"]["duration_us"] == 1_000_000


def test_heartbeat_hand_case(spark, tmp_path):
    """beats at 0, 10min, 60min with T=30min: uptime = 10+30+30 = 70min
    over a 90min span; longest gap 50min."""
    from datetime import datetime, timedelta

    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    t0 = datetime(2024, 1, 1)
    rows = [
        (i + 1, 7, t0 + timedelta(minutes=m), "signup", 1.0, "{}")
        for i, m in enumerate((0, 10, 60))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "hb")
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    r = REGISTRY["heartbeat_agg"](spark, p).collect()[0]
    mn = 60 * 1_000_000
    assert r["n_beats"] == 3
    assert r["longest_gap_us"] == 50 * mn
    assert r["uptime_us"] == 70 * mn
    assert r["span_us"] == 90 * mn
    assert r["uptime_pct"] == pytest.approx(70 * 100 / 90, abs=1e-9)


def test_m4_keeps_the_four_points(spark):
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    out = REGISTRY["m4_downsample"](spark, SF).collect()
    assert out
    for r in out[:50]:
        assert r["v_min"] <= min(r["v_first"], r["v_last"]) + 1e-12
        assert r["v_max"] >= max(r["v_first"], r["v_last"]) - 1e-12
        assert r["ts_first"] <= r["ts_last"]


# ---------------------------------------------------------------------------
# PLA blocks + robust outliers (tsrobust_q)
# ---------------------------------------------------------------------------


def test_pla_matches_numpy_ols(spark):
    from dtaidistance_spark.operators import tsrobust_q  # noqa: F401

    out = REGISTRY["pla_blocks"](spark, SF)
    rows = {
        (r["doc_id"], r["block_id"]): r
        for r in out.where(out.doc_id == "doc000000000002").collect()
    }
    x = _tokens(2)
    j = np.arange(16, dtype=np.float64)
    for b in range(len(x) // 16):
        blk = x[b * 16:(b + 1) * 16].astype(np.float64)
        slope, icept = np.polyfit(j, blk, 1)
        r = rows[("doc000000000002", b)]
        assert r["slope"] == pytest.approx(slope, rel=1e-9, abs=1e-9)
        assert r["icept"] == pytest.approx(icept, rel=1e-9, abs=1e-9)
        res = blk - (r["icept"] + r["slope"] * j)
        assert r["max_abs_resid"] == pytest.approx(np.abs(res).max(), abs=1e-6)
        assert r["argmax_j"] == int(np.argmax(np.abs(res) >= np.abs(res).max()))


def test_robust_outliers_matches_numpy(spark):
    from dtaidistance_spark.operators import tsrobust_q  # noqa: F401

    out = REGISTRY["robust_outliers"](spark, SF)
    rows = {r["doc_id"]: r for r in out.where(
        out.doc_id.isin("doc000000000004", "doc000000000019")).collect()}
    for i in (4, 19):
        x = _tokens(i).astype(np.float64)
        med = np.median(x)
        mad = np.median(np.abs(x - med))
        rz = np.abs((x - med) / (1.4826 * mad))
        r = rows[f"doc{i:012d}"]
        assert r["med"] == med and r["mad"] == mad
        assert r["n_outliers"] == int((rz > 3.5).sum())
        assert r["max_abs_rz"] == pytest.approx(rz.max(), rel=1e-12)


# ---------------------------------------------------------------------------
# CCF + lead-lag (TS12)
# ---------------------------------------------------------------------------


def test_ccf_matches_numpy(spark):
    out = REGISTRY["ccf_pairs"](spark, SF)
    rows = {
        r["lag"]: r
        for r in out.where(out.doc_a == "doc000000000000").collect()
    }
    x = _tokens(0)
    y = _tokens(1)
    L = min(len(x), len(y), 512)
    for k, r in rows.items():
        s = abs(k)
        if k >= 0:
            a, b = x[: L - s], y[s:L]
        else:
            a, b = x[s:L], y[: L - s]
        ref = np.corrcoef(a.astype(float), b.astype(float))[0, 1]
        assert r["n"] == L - s
        assert r["ccf"] == pytest.approx(ref, abs=1e-9), (k, ref)


def test_lead_lag_is_ccf_argmax(spark):
    ccf = REGISTRY["ccf_pairs"](spark, SF).collect()
    best: dict[str, tuple] = {}
    for r in ccf:
        key = (-abs(r["ccf"]), r["lag"])
        if r["doc_a"] not in best or key < best[r["doc_a"]][0]:
            best[r["doc_a"]] = (key, r["lag"], r["ccf"])
    out = REGISTRY["lead_lag_detect"](spark, SF).collect()
    assert len(out) == len(best) == 128
    for r in out:
        _, lag, val = best[r["doc_a"]]
        assert (r["best_lag"], r["best_ccf"]) == (lag, val)


# ---------------------------------------------------------------------------
# Interval overlap join (R23)
# ---------------------------------------------------------------------------


def test_interval_join_bucketed_equals_theta_and_no_cartesian(spark):
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators import tsops_q  # noqa: F401

    df = REGISTRY["interval_overlap_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the session x incident pairing must ride the bucket equi-join
    assert "CartesianProduct" not in plan
    got = {r["incident_id"]: r for r in df.collect()}
    # theta-join reference computed directly in Spark
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        F.col("event_type") == "purchase"
    )
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias("ss"),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias("se"),
        )
    )
    inc = spark.range(48).select(
        F.col("id").cast("int").alias("incident_id"),
        (
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + F.col("id") * F.lit(15 * 3600 * 1_000_000)
        ).alias("istart"),
        (
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + F.col("id") * F.lit(15 * 3600 * 1_000_000)
            + (1 + F.col("id") % 5) * F.lit(3600 * 1_000_000)
        ).alias("iend"),
    )
    theta = (
        sess.crossJoin(inc)
        .where((F.col("ss") < F.col("iend")) & (F.col("istart") < F.col("se")))
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                F.least("se", "iend") - F.greatest("ss", "istart")
            ).alias("total_overlap_us"),
        )
    )
    ref = {r["incident_id"]: r for r in theta.collect()}
    for k in range(48):
        want_n = ref[k]["n_sessions"] if k in ref else 0
        want_ov = ref[k]["total_overlap_us"] if k in ref else 0
        assert got[k]["n_sessions"] == want_n, k
        assert got[k]["total_overlap_us"] == want_ov, k


# ---------------------------------------------------------------------------
# Goertzel power + dominant period (TS13); funnel + cohort (R24/R25)
# ---------------------------------------------------------------------------


def test_goertzel_matches_numpy_dft(spark):
    """Goertzel power at period P == |DFT bin at n/P|^2 of the
    truncated series (full cycles -> the bin is exact)."""
    out = REGISTRY["goertzel_power"](spark, SF)
    rows = {
        (r["doc_id"], r["period"]): r["power"]
        for r in out.where(out.doc_id == "doc000000000006").collect()
    }
    x = _tokens(6).astype(np.float64)
    n = len(x) - len(x) % 64
    x = x[:n]
    for p in (64, 32, 16, 8):
        bin_k = n // p
        ref = np.abs(np.fft.rfft(x)[bin_k]) ** 2
        got = rows[("doc000000000006", p)]
        assert got == pytest.approx(ref, rel=1e-6), (p, ref, got)


def test_dominant_period_is_power_argmax(spark):
    """dominant_period must equal the (power DESC, period ASC) argmax
    of goertzel_power row for row. (The broad-spectrum modular ramp
    outweighs the planted sinusoid for most docs — a deterministic ~49
    of 256 still peak at the planted period 64, which the last assert
    pins.)"""
    pw = REGISTRY["goertzel_power"](spark, SF).collect()
    best: dict[str, tuple] = {}
    for r in pw:
        key = (-r["power"], r["period"])
        if r["doc_id"] not in best or key < best[r["doc_id"]][0]:
            best[r["doc_id"]] = (key, r["period"], r["power"])
    out = REGISTRY["dominant_period"](spark, SF).collect()
    assert len(out) == 256
    for r in out:
        _, period, power = best[r["doc_id"]]
        assert (r["dominant_period"], r["peak_power"]) == (period, power)
    n64 = sum(1 for r in out if r["dominant_period"] == 64)
    assert n64 >= 30, n64


def test_funnel_counts_monotone(spark):
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    r = REGISTRY["funnel_analysis"](spark, SF).collect()[0]
    assert r["n_signup"] >= r["n_viewed_after"] >= r["n_purchased_after"]
    assert r["n_purchased_after"] >= r["n_converted_24h"] >= 0


def test_cohort_week0_is_cohort_size(spark):
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    rows = REGISTRY["cohort_retention"](spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_no"]] = r
    for c, weeks in by_cohort.items():
        assert 0 in weeks
        assert weeks[0]["n_active"] == weeks[0]["cohort_size"]
        for w, r in weeks.items():
            assert r["n_active"] <= r["cohort_size"]


# ---------------------------------------------------------------------------
# Swinging-door compression (E4)
# ---------------------------------------------------------------------------


def _sdt_verify(ts, vals, keep, tol):
    for a, b in zip(keep, keep[1:]):
        for i in range(a + 1, b):
            interp = vals[a] + (vals[b] - vals[a]) * (ts[i] - ts[a]) / (
                ts[b] - ts[a]
            )
            assert abs(interp - vals[i]) <= tol + 1e-12, (a, b, i)


def test_sdt_guarantee_and_compression(spark):
    from dtaidistance_spark.functions.sdt import swinging_door

    rng_free = np.arange(200, dtype=np.float64)
    # smooth ramp + mild wiggle: compresses hard
    y = 0.5 * rng_free + np.sin(rng_free / 5)
    keep = swinging_door(rng_free, y, 2.0)
    assert keep[0] == 0 and keep[-1] == 199
    assert len(keep) < 20
    _sdt_verify(rng_free, y, keep, 2.0)
    # adversarial: deterministic rough series — guarantee must hold
    # even when the greedy doors alone would overshoot
    z = np.array([((i * 2654435761) % 97) / 7.0 for i in range(300)])
    keep = swinging_door(rng_free[:300] if len(rng_free) >= 300 else
                         np.arange(300, dtype=np.float64), z, 3.0)
    _sdt_verify(np.arange(300, dtype=np.float64), z, keep, 3.0)
    # step function: both edges of the step kept
    s = np.where(np.arange(100) < 50, 0.0, 100.0)
    keep = swinging_door(np.arange(100, dtype=np.float64), s, 1.0)
    _sdt_verify(np.arange(100, dtype=np.float64), s, keep, 1.0)
    assert 49 in keep and 50 in keep
    # degenerate sizes
    assert swinging_door([0.0], [1.0], 1.0) == [0]
    assert swinging_door([0.0, 1.0], [1.0, 5.0], 1.0) == [0, 1]


# ---------------------------------------------------------------------------
# Mann-Kendall + Sen's slope (TS14)
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_numpy(spark, tmp_path):
    """Hand-built reference on real event data for two users."""
    from pyspark.sql import functions as F

    out = REGISTRY["mann_kendall_trend"](spark, SF)
    rows = {r["user_id"]: r for r in out.collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        F.col("event_type") == "view"
    )
    for uid in list(rows)[:3]:
        pts = sorted(
            (r["ts"], r["event_id"], r["value"])
            for r in ev.where(F.col("user_id") == uid).collect()
        )
        v = np.array([p[2] for p in pts])
        t = np.array([p[0].timestamp() * 1e6 for p in pts])
        n = len(v)
        s = sum(
            np.sign(v[j] - v[i])
            for i in range(n - 1)
            for j in range(i + 1, n)
        )
        var = n * (n - 1) * (2 * n + 5) / 18
        z = (s - np.sign(s)) / np.sqrt(var) if s != 0 else 0.0
        slopes = sorted(
            (v[j] - v[i]) / ((t[j] - t[i]) / 86400e6)
            for i in range(n - 1)
            for j in range(i + 1, n)
            if t[j] != t[i]
        )
        m = len(slopes)
        sen = (
            slopes[m // 2]
            if m % 2 == 1
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        )
        r = rows[uid]
        assert r["n"] == n and r["s_stat"] == int(s)
        assert r["mk_var"] == pytest.approx(var, rel=1e-12)
        assert r["z"] == pytest.approx(z, rel=1e-9)
        assert r["sens_slope"] == pytest.approx(sen, rel=1e-9)
        want = (
            "increasing" if z > 1.96 else
            "decreasing" if z < -1.96 else "none"
        )
        assert r["trend"] == want


def test_winsorize_matches_numpy(spark):
    from dtaidistance_spark.operators import tsrobust_q  # noqa: F401

    out = REGISTRY["winsorize_series"](spark, SF)
    rows = {r["doc_id"]: r for r in out.where(
        out.doc_id.isin("doc000000000008", "doc000000000033")).collect()}
    import hashlib

    for i in (8, 33):
        x = _tokens(i)
        n = len(x)
        st = np.sort(x)
        lo = int(st[max(1, (n * 5 + 99) // 100) - 1])
        hi = int(st[(n * 95 + 99) // 100 - 1])
        clamped = np.clip(x, lo, hi)
        md5 = hashlib.md5(
            ",".join(str(int(v)) for v in clamped).encode()
        ).hexdigest()
        r = rows[f"doc{i:012d}"]
        assert (r["lo"], r["hi"]) == (lo, hi)
        assert r["n_below"] == int((x < lo).sum())
        assert r["n_above"] == int((x > hi).sum())
        assert r["clamped_md5"] == md5


def test_spearman_matches_scipy_free_reference(spark):
    out = REGISTRY["spearman_pairs"](spark, SF)
    rows = {r["doc_a"]: r for r in out.collect()}
    assert len(rows) == 128

    def avg_ranks(x):
        order = np.argsort(x, kind="stable")
        r = np.empty(len(x), dtype=np.float64)
        sx = x[order]
        i = 0
        while i < len(x):
            j = i
            while j + 1 < len(x) and sx[j + 1] == sx[i]:
                j += 1
            r[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return r

    for i in (0, 12):
        x = _tokens(2 * i)
        y = _tokens(2 * i + 1)
        L = min(len(x), len(y), 512)
        rx, ry = avg_ranks(x[:L]), avg_ranks(y[:L])
        ref = np.corrcoef(rx, ry)[0, 1]
        r = rows[f"doc{2 * i:012d}"]
        assert r["n"] == L
        assert r["rho"] == pytest.approx(ref, abs=1e-9), (i, ref)


# ---------------------------------------------------------------------------
# TS14/TS15 scale tiers: bit-equality with the O(n^2) verification twins
# ---------------------------------------------------------------------------


def test_mann_kendall_scaled_bit_equals_twin(spark):
    """The merge-count S, tied-pair count, variance, Z, and trend label
    must be BIT-EQUAL to the O(n^2) HOF twin; the sampled Sen estimator
    column (honestly renamed sens_slope_est) is checked for plain
    finiteness + sign agreement with the exact twin on strong trends."""
    twin = {
        r["user_id"]: r
        for r in REGISTRY["mann_kendall_trend"](spark, SF).collect()
    }
    scaled = {
        r["user_id"]: r
        for r in REGISTRY["mann_kendall_scaled"](spark, SF).collect()
    }
    assert set(twin) == set(scaled) and len(twin) >= 10
    for uid, t in twin.items():
        s = scaled[uid]
        assert s["n"] == t["n"]
        assert s["s_stat"] == t["s_stat"], uid
        assert s["n_tied_pairs"] == t["n_tied_pairs"], uid
        # identical float strings -> identical doubles, no tolerance
        assert s["mk_var"] == t["mk_var"], uid
        assert s["z"] == t["z"], uid
        assert s["trend"] == t["trend"], uid
        if abs(t["z"]) > 1.96 and s["sens_slope_est"] is not None:
            assert np.sign(s["sens_slope_est"]) == np.sign(
                t["sens_slope"]
            ), uid


def test_spearman_scaled_bit_equals_twin(spark):
    """Window-rank doubled ranks == HOF-counted doubled ranks, so every
    rho must be the identical double (same int64 cross-sums, same float
    tail)."""
    twin = {
        r["doc_a"]: r for r in REGISTRY["spearman_pairs"](spark, SF).collect()
    }
    scaled = {
        r["doc_a"]: r
        for r in REGISTRY["spearman_scaled"](spark, SF).collect()
    }
    assert set(twin) == set(scaled) and len(twin) == 128
    for k, t in twin.items():
        s = scaled[k]
        assert (s["doc_b"], s["n"]) == (t["doc_b"], t["n"])
        assert s["rho"] == t["rho"], k  # bit-exact, no tolerance


def test_seasonal_decompose_matches_numpy(spark):
    """TS16 == the textbook classical decomposition: trend = centered
    2x64-MA with half-weight ends, seasonal = centered per-phase means
    of detrended, remainder = rest; additivity holds exactly."""
    out = REGISTRY["seasonal_decompose"](spark, SF)
    rows = out.where(out.doc_id.isin("doc000000000002", "doc000000000005"))
    got = {}
    for r in rows.collect():
        got.setdefault(r["doc_id"], {})[r["pos"]] = (
            r["trend"], r["seasonal"], r["remainder"]
        )
    p, h = 64, 32
    for i in (2, 5):
        x = _tokens(i)[:512].astype(np.float64)
        n = len(x)
        if n < 2 * p:
            assert f"doc{i:012d}" not in got
            continue
        # trend via convolution with the classical 2xMA kernel
        kern = np.ones(p + 1) / p
        kern[0] = kern[-1] = 1 / (2 * p)
        trend = np.full(n, np.nan)
        for t in range(h, n - h):
            trend[t] = float(np.dot(kern, x[t - h : t + h + 1]))
        detr = x - trend
        seas_means = np.array([
            np.nanmean(detr[np.arange(n) % p == k]) for k in range(p)
        ])
        seas_means -= seas_means.mean()
        d = got[f"doc{i:012d}"]
        assert len(d) == n - p
        for t1 in sorted(d):
            t0 = t1 - 1  # queries are 1-based positions
            tr, se, re_ = d[t1]
            assert tr == pytest.approx(trend[t0], rel=1e-12), (i, t1)
            assert se == pytest.approx(seas_means[t0 % p], rel=1e-9, abs=1e-9)
            assert re_ == pytest.approx(
                detr[t0] - seas_means[t0 % p], rel=1e-9, abs=1e-9
            )
            # additivity: trend + seasonal + remainder == x exactly-ish
            assert tr + se + re_ == pytest.approx(x[t0], rel=1e-12)


def test_seasonal_decompose_scaled_bit_equals_twin(spark):
    """The window-sum scale tier must reproduce every trend/seasonal/
    remainder double of the HOF twin bit-for-bit (same int64 sums, same
    float tail)."""
    twin = {
        (r["doc_id"], r["pos"]): (r["trend"], r["seasonal"], r["remainder"])
        for r in REGISTRY["seasonal_decompose"](spark, SF).collect()
    }
    scaled = {
        (r["doc_id"], r["pos"]): (r["trend"], r["seasonal"], r["remainder"])
        for r in REGISTRY["seasonal_decompose_scaled"](spark, SF).collect()
    }
    assert set(twin) == set(scaled) and len(twin) > 10_000
    for k, tv in twin.items():
        assert scaled[k] == tv, k  # bit-exact, no tolerance


def test_asap_smooth_matches_numpy(spark):
    """TS20: full numpy recompute for two docs — window = ACF argmax
    over lags >= 2 (ties smallest), MA built explicitly with
    np.convolve, roughness = sqrt(mean squared consecutive diff) on
    the materialized smoothed array. The query never builds that
    array (telescoped diffs), so agreement here proves the identity."""
    from dtaidistance_spark.operators import tsanalytics_q  # noqa: F401

    out = REGISTRY["asap_smooth"](spark, SF)
    rows = {
        r["doc_id"]: r
        for r in out.where(
            out.doc_id.isin("doc000000000003", "doc000000000017")
        ).collect()
    }
    for i in (3, 17):
        x = _tokens(i).astype(np.float64)
        n = len(x)
        cand = [k for k in (2, 4, 8, 16, 32, 64) if k < n]
        acfs = [(-_acf_ref(_tokens(i), k), k) for k in cand]
        w = min(acfs)[1]
        r = rows[f"doc{i:012d}"]
        assert r["w"] == w and r["m"] == n - w + 1
        ma = np.convolve(x, np.ones(w) / w, mode="valid")
        assert len(ma) == r["m"]
        rough_raw = float(np.sqrt(np.mean(np.diff(x) ** 2)))
        rough_ma = float(np.sqrt(np.mean(np.diff(ma) ** 2)))
        assert r["rough_raw"] == pytest.approx(rough_raw, rel=1e-12)
        assert r["rough_ma"] == pytest.approx(rough_ma, rel=1e-9)
        assert r["gain"] == pytest.approx(rough_raw / rough_ma, rel=1e-9)
        assert r["ma_first"] == pytest.approx(ma[0], rel=1e-12)
        assert r["ma_last"] == pytest.approx(ma[-1], rel=1e-12)
        assert r["ma_mean"] == pytest.approx(float(ma.mean()), rel=1e-12)
        # smoothing at the dominant period must actually smooth
        assert r["gain"] is None or r["gain"] > 1.0


def test_stats_moments_match_numpy(spark):
    """TS21: the exact moment sums and the population mean/var/skew/
    raw-kurtosis must match a from-scratch numpy recompute per source."""
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    rows = {
        r["source"]: r
        for r in REGISTRY["stats_moments_agg"](spark, SF).collect()
    }
    pdf = synth.sequences_local(256)
    for src in ("web", "code", "books"):
        x = np.concatenate(
            [np.asarray(t, dtype=np.int64)
             for t, s in zip(pdf["tokens"], pdf["source"]) if s == src]
        )
        r = rows[src]
        assert r["n"] == len(x)
        assert r["s1"] == int(x.sum())
        assert r["s2"] == int((x.astype(object) ** 2).sum())
        assert int(r["s3"]) == int((x.astype(object) ** 3).sum())
        assert int(r["s4"]) == int((x.astype(object) ** 4).sum())
        xf = x.astype(np.float64)
        mu = xf.mean()
        m2 = ((xf - mu) ** 2).mean()
        m3 = ((xf - mu) ** 3).mean()
        m4 = ((xf - mu) ** 4).mean()
        assert r["mean"] == pytest.approx(mu, rel=1e-12)
        assert r["var_pop"] == pytest.approx(m2, rel=1e-9)
        assert r["skew"] == pytest.approx(m3 / m2 ** 1.5, rel=1e-6)
        assert r["kurt"] == pytest.approx(m4 / m2 ** 2, rel=1e-6)


def test_stats_moments_merge_contract(spark):
    from dtaidistance_spark.operators import tshyper_q  # noqa: F401

    rows = REGISTRY["stats_moments_merge_check"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["merge_equals_direct"] is True
        assert r["three_sources"] is True


# ---------------------------------------------------------------------------
# TS32/TS33 — gauge_agg + burstiness (tshyper_q round-3 batch)
# ---------------------------------------------------------------------------


def test_gauge_agg_matches_pandas(spark, sf_dir):
    import math

    import pandas as pd

    from dtaidistance_spark.operators.tshyper_q import gauge_agg

    out = gauge_agg(spark, sf_dir).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["tu", "event_id"]).reset_index(drop=True)
        row = out.loc[et]
        assert row.n_samples == len(g)
        v = g["value"].to_numpy()
        assert row.delta == v[-1] - v[0]
        assert row.idelta == v[-1] - v[-2]
        want_rate = (v[-1] - v[-2]) / (
            (g["tu"].iloc[-1] - g["tu"].iloc[-2]) / 1e6
        )
        assert row.irate_per_s == pytest.approx(
            math.floor(want_rate * 1e6 + 0.5) / 1e6, abs=2e-6
        )
        assert row.n_changes == int((v[1:] != v[:-1]).sum())


def test_burstiness_matches_numpy(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from dtaidistance_spark.operators.tshyper_q import burstiness

    out = burstiness(spark, sf_dir).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tsec"] = ev["ts"].astype("datetime64[us]").astype("int64") // 10**6
    for et, g in ev.groupby("event_type"):
        row = out.loc[et]
        h = g["tsec"] // 3600
        n_hours = int(h.max() - h.min() + 1)
        counts = h.value_counts().to_numpy()
        full = np.zeros(n_hours)
        full[: len(counts)] = counts  # zeros included; moments only
        sc, sc2 = counts.sum(), (counts**2).sum()
        fano = (n_hours * sc2 - sc * sc) / (n_hours * sc)
        assert row.n_hours == n_hours
        assert row.fano == pytest.approx(fano, abs=2e-6)
        gps = np.diff(np.sort(g["tsec"].to_numpy()))
        m, s = gps.mean(), gps.std()  # population std == the engine's
        assert row.burstiness_b == pytest.approx((s - m) / (s + m), abs=1e-4)
        # events are near-Poisson -> B near 0, strictly > periodic -1
        assert -0.5 < row.burstiness_b < 0.5


def test_interpolated_daily_avg_semantics(spark, sf_dir):
    """TS34: per-user totals must telescope — Σ_buckets covered_us ==
    whole-series span, Σ num == whole-series integral — and each
    bucket's covered span never exceeds a day."""
    import pandas as pd

    from dtaidistance_spark.operators.tshyper_q import (
        _DAY_US,
        interpolated_daily_avg,
        time_weighted_avg,
    )

    out = interpolated_daily_avg(spark, sf_dir).toPandas()
    assert (out["covered_us"] <= _DAY_US).all()
    assert (out["covered_us"] > 0).all()
    twa = time_weighted_avg(spark, sf_dir).toPandas().set_index("user_id")
    got = out.assign(integ=out.avg_interp * out.covered_us).groupby("user_id")
    spans = got["covered_us"].sum()
    integ = got["integ"].sum()
    for uid, span in spans.items():
        assert span == twa.loc[uid, "span_us"], uid
        # bucket-level round(6) noise accumulates over <=30 buckets
        want = twa.loc[uid, "twa"] * twa.loc[uid, "span_us"]
        assert integ[uid] == pytest.approx(want, rel=1e-6), uid
    # LOCF carry actually crosses midnight: some user has a bucket with
    # covered_us == a full day but no sample inside it (n_segments == 1)
    full = out[(out.covered_us == _DAY_US) & (out.n_segments == 1)]
    assert len(full) > 0


def test_macd_matches_pandas_ewm(spark, sf_dir):
    """TS35 vs pandas .ewm(span, adjust=True): same daily means in,
    same EMA/MACD/signal out (to the floor-1e6 grain)."""
    import numpy as np

    from dtaidistance_spark.operators.tshyper_q import macd_signal

    out = macd_signal(spark, sf_dir).toPandas()
    for et, g in out.groupby("event_type"):
        g = g.sort_values("t").reset_index(drop=True)
        dm = g["dm"]
        e12 = dm.ewm(span=12, adjust=True).mean()
        e26 = dm.ewm(span=26, adjust=True).mean()
        m = e12 - e26
        s9 = m.ewm(span=9, adjust=True).mean()
        assert np.allclose(g["ema12"], e12, atol=2e-6)
        assert np.allclose(g["ema26"], e26, atol=2e-6)
        assert np.allclose(g["macd"], m, atol=2e-6)
        assert np.allclose(g["signal"], s9, atol=2e-6)
        assert np.allclose(g["hist"], m - s9, atol=4e-6)
        want_cross = (
            (g["hist"] > 0) != (g["hist"].shift(1) > 0)
        )[1:].to_numpy()
        assert (g["crossover"][1:].to_numpy() == want_cross).all()
        assert g["crossover"].iloc[0] is None or np.isnan(
            g["crossover"].iloc[0]
        )


def test_markov_transitions_match_pandas(spark, sf_dir):
    import pandas as pd

    from dtaidistance_spark.operators.tsanalytics_q import markov_transitions

    out = markov_transitions(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "tu", "event_id"])
    ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
    tr = ev[ev.nxt.notna()]
    want = tr.groupby(["event_type", "nxt"]).size()
    idx = out.set_index(["cur", "nxt"])
    assert len(out) == len(want)
    for (cur, nxt), n in want.items():
        row = idx.loc[(cur, nxt)]
        assert row["n"] == n
    # rows are conditional distributions
    sums = out.groupby("cur")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_km_survival_matches_reference(spark, sf_dir):
    import pandas as pd

    from dtaidistance_spark.operators.tsanalytics_q import (
        _KM_DAY,
        km_survival,
    )

    out = km_survival(spark, sf_dir).toPandas().set_index("day").sort_index()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    t0 = ev[ev.event_type == "signup"].groupby("user_id")["tu"].min()
    tmax = ev["tu"].max()
    pur = ev[ev.event_type == "purchase"].merge(
        t0.rename("t0"), on="user_id"
    )
    tp = pur[pur.tu > pur.t0].groupby("user_id")["tu"].min()
    durs, evs = [], []
    for uid, start in t0.items():
        if uid in tp.index:
            durs.append((tp.loc[uid] - start) // _KM_DAY)
            evs.append(1)
        else:
            durs.append((tmax - start) // _KM_DAY)
            evs.append(0)
    df = pd.DataFrame({"dur": durs, "ev": evs})
    s = 1.0
    n = len(df)
    for day in sorted(df.dur.unique()):
        d = int(df[(df.dur == day) & (df.ev == 1)].shape[0])
        at_risk = int((df.dur >= day).sum())
        if d > 0:
            srow = out.loc[day]
            assert srow.n_events == d
            assert srow.n_at_risk == at_risk
            s *= 1.0 - d / at_risk
            assert srow.s_km == pytest.approx(s, abs=1e-5), day
    # survival is monotone nonincreasing in [0, 1]
    km = out["s_km"].to_numpy()
    assert (km[:-1] >= km[1:] - 1e-9).all()
    assert km[0] <= 1.0 and km[-1] >= 0.0


def test_forecast_backtest_matches_pandas(spark, sf_dir):
    import math

    import numpy as np
    import pandas as pd

    from dtaidistance_spark.operators.tshyper_q import forecast_backtest

    out = forecast_backtest(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    for et, g in ev.groupby("event_type"):
        dm = g.groupby("day")["value"].mean().map(f6).sort_index()
        n = len(dm)
        train = dm.iloc[: n - 7]
        mae1 = train.diff().abs().dropna().mean()
        test_act = dm.iloc[n - 7 :]
        fcst = dm.shift(7).iloc[n - 7 :]
        mae_s = (test_act - fcst).abs().mean()
        sub = out[out.event_type == et].set_index("day").sort_index()
        assert len(sub) == 7
        for day in sub.index:
            assert sub.loc[day, "actual"] == pytest.approx(dm.loc[day], abs=2e-6)
            assert sub.loc[day, "fcst"] == pytest.approx(
                dm.shift(7).loc[day], abs=2e-6
            )
        assert np.allclose(sub["mase"], f6(mae_s / mae1), atol=2e-5)
        # unstructured synthetic series: seasonal-naive within the same
        # order of magnitude as the drift baseline
        assert 0.2 < sub["mase"].iloc[0] < 3.0


# ---------------------------------------------------------------------------
# Benford first-digit test (TS39, tsrobust_q)
# ---------------------------------------------------------------------------


def test_benford_matches_pandas(spark, sf_dir):
    import math

    import pandas as pd

    from dtaidistance_spark.operators import tsrobust_q  # noqa: F401

    out = REGISTRY["benford_digit_test"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    v = ev.loc[ev["value"] > 0, ["event_type", "value"]].copy()
    v["c"] = np.floor(v["value"] * 100.0 + 0.5).astype("int64")
    v = v[v["c"] > 0]
    v["d"] = v["c"].astype(str).str[0].astype("int64")
    for et, g in v.groupby("event_type"):
        obs = g.groupby("d").size()
        n = int(obs.sum())
        sub = out[out.event_type == et].set_index("digit").sort_index()
        # every observed digit present, counts exact
        assert set(sub.index) == set(obs.index)
        chi2 = 0.0
        for d in obs.index:
            p = math.log10(1.0 + 1.0 / d)
            term = (obs[d] - n * p) ** 2 / (n * p)
            chi2 += term
            assert int(sub.loc[d, "n_obs"]) == int(obs[d])
            assert int(sub.loc[d, "n"]) == n
            assert sub.loc[d, "p_benford"] == pytest.approx(f6(p), abs=2e-6)
            assert sub.loc[d, "chi2_term"] == pytest.approx(term, abs=2e-6)
        # χ² column is constant per type and equals the sum of terms
        assert sub["chi2"].nunique() == 1
        assert sub["chi2"].iloc[0] == pytest.approx(chi2, rel=1e-6)
        # events.value spans ~4 decades exponentially (0.03–327), the
        # regime where Benford genuinely holds: the screen must NOT fire
        # (χ² at 8 dof stays under the 99.9% critical value ≈ 26.1), and
        # digit 1 is modal near the log10(2) ≈ 0.301 Benford mass
        assert chi2 < 26.1
        assert obs.idxmax() == 1
        assert 0.2 < obs[1] / n < 0.4
