"""Flagship DTW/DBA queries for the driver registry.

The barycenter kernels are not SQL-expressible, so most entries are
rows-only checks (the pytest tier-parity + golden-vector gates carry
their correctness); ``events_profile_counts`` projects the flagship
rollup's group cardinalities, which ARE SQL-expressible, giving the
DuckDB oracle a direct check that the applyInPandas grouping is right.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from dtaidistance_spark import kernels as K
from dtaidistance_spark import synth
from dtaidistance_spark.operators import pairs as P
from dtaidistance_spark.operators import qutil as Q
from dtaidistance_spark.operators import rollup as R
from dtaidistance_spark.operators.queries import T, register


def _seq_n() -> int:
    return int(os.environ.get("SPARK_GRAFT_SEQ_N", "1200"))


def _round_arr(df, col, nd=4):
    """Round the array column then serialize it to JSON: the driver's
    pandas canonicalization cannot sort list cells (round-1 err)."""
    return Q.jsonify_complex(
        df.withColumn(col, F.transform(F.col(col), lambda x: F.round(x, nd)))
    )


@register("seq_rollup_1m")
def seq_rollup_1m(spark, sf_dir):
    """North-rule flagship: 1-minute DBA rollup of the synthetic
    pre-tokenized sequence table (rows-only; exact parity vs the local
    reference pipeline is gated in tests/test_rollup_e2e.py)."""
    df = synth.sequences_df(spark, _seq_n())
    return _round_arr(R.dba_rollup(df, tier="1 minute"), "barycenter")


@register("seq_cascade_1d")
def seq_cascade_1d(spark, sf_dir):
    df = synth.sequences_df(spark, _seq_n())
    tiers = R.cascade(df, tiers=("1 minute", "1 hour", "1 day"))
    return _round_arr(tiers["1 day"], "barycenter")


@register("dtw_pairs_threshold")
def dtw_pairs_threshold(spark, sf_dir):
    """Distance-matrix workload (M1) with the LB cascade, on PAA-64
    synthetic series."""
    df = Q.paa_series_df(spark, 160, length=64)
    out = P.dtw_pairs(df, threshold=8000.0, window=8)
    return out.select("id_a", "id_b", F.round("dist", 4).alias("dist"))


@register("dtw_knn_seq")
def dtw_knn_seq(spark, sf_dir):
    df = Q.paa_series_df(spark, 160, length=64)
    pdf = synth.sequences_local(8)
    qs = [
        ("q0", K.paa(np.asarray(pdf["tokens"].iloc[0], dtype=np.float64), 64)),
        ("q1", K.paa(np.asarray(pdf["tokens"].iloc[7], dtype=np.float64), 64)),
    ]
    out = P.dtw_knn(df, qs, k=5, window=8)
    return out.select("query_id", "doc_id", "rank", F.round("dist", 4).alias("dist"))


@register("subsequence_search_seq")
def subsequence_search_seq(spark, sf_dir):
    df = Q.paa_series_df(spark, 60, length=96)
    pdf = synth.sequences_local(4)
    q = K.paa(np.asarray(pdf["tokens"].iloc[3], dtype=np.float64), 96)[20:52]
    out = P.subsequence_search(df, q, k=10, window=16)
    return out.select("doc_id", "start", "end", F.round("value", 4).alias("value"))


def _event_series(spark, sf_dir, max_points_per_series: int | None = None):
    """events -> one value-series per (user_id, day): the per-user daily
    activity curve, built JVM-side (array_sort(collect_list(struct))).

    ``max_points_per_series`` applies the engine's bounded-buffer
    pattern (window-rank stride filter BEFORE the aggregate, as in
    dba_rollup/encode_blocks) so a pathological user-day with millions
    of events cannot blow one aggregation buffer; the default None
    keeps every point (the registry queries' oracle counts each raw
    event, and real user-days are small)."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    if max_points_per_series is not None:
        m = int(max_points_per_series)
        wsort = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
        wall = Window.partitionBy("user_id", "day")
        ev = (
            ev.withColumn("_i", F.row_number().over(wsort) - 1)
            .withColumn("_n", F.count(F.lit(1)).over(wall))
            .where(
                F.expr(
                    f"_n <= {m} OR "
                    f"((_i * {m} + _n - 1) div _n) * _n < (_i + 1) * {m}"
                )
            )
        )
    return (
        ev.groupBy(F.col("user_id"), F.col("day"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("evs")
        )
        .select(
            F.concat(F.col("user_id").cast("string"), F.lit("@"), F.col("day").cast("string")).alias("doc_id"),
            F.transform("evs", lambda e: e["value"]).alias("tokens"),
            F.lit("all").alias("source"),
            F.col("day").alias("ts"),
        )
    )


@register("events_daily_profile")
def events_daily_profile(spark, sf_dir):
    """Flagship on the shared tables: DBA barycenter of all users' daily
    activity curves, per day — the 'representative daily profile'."""
    series = _event_series(spark, sf_dir)
    out = R.dba_rollup(series, tier="1 day", barycenter_len=48, dba_window=8)
    return _round_arr(out, "barycenter")


@register(
    "events_profile_counts",
    oracle="""
    SELECT 'all' AS key, date_trunc('day', ts)::TIMESTAMP AS window_start,
           count(DISTINCT user_id) AS n_series,
           count(*)                AS n_points
    FROM events GROUP BY 2
    """,
)
def events_profile_counts(spark, sf_dir):
    """Oracle-checkable projection of the flagship rollup: group
    cardinalities (n_series/n_points) must equal plain SQL over events."""
    series = _event_series(spark, sf_dir)
    out = R.dba_rollup(series, tier="1 day", barycenter_len=48, dba_window=8)
    return out.select("key", "window_start", "n_series", "n_points")


@register(
    "dtw_pairs_check",
    oracle="SELECT 1213 AS n_pairs, true AS le_threshold, true AS ordered_ids",
)
def dtw_pairs_check(spark, sf_dir):
    """Invariant projection of the LB-cascade distance matrix: the
    deterministic synthetic corpus yields exactly 1213 pairs at
    threshold 8000 (golden count — the LB cascade dropping or
    duplicating a pair changes it), every distance within the
    threshold, every pair in condensed id_a < id_b form."""
    df = Q.paa_series_df(spark, 160, length=64)
    out = P.dtw_pairs(df, threshold=8000.0, window=8)
    return out.agg(
        F.count(F.lit(1)).cast("int").alias("n_pairs"),
        (F.max("dist") <= 8000.0).alias("le_threshold"),
        (F.sum((F.col("id_a") < F.col("id_b")).cast("int")) == F.count(F.lit(1))).alias("ordered_ids"),
    )


@register(
    "dtw_knn_check",
    oracle="""
    SELECT q.query_id, r.rank::INT AS rank, true AS ok
    FROM (SELECT unnest(['q0', 'q1']) AS query_id) q,
         (SELECT unnest(range(1, 6)) AS rank) r
    """,
)
def dtw_knn_check(spark, sf_dir):
    """Invariant projection of kNN: exactly ranks 1..k for each query
    (the oracle enumerates them) with finite nonnegative distances —
    the LB cascade + running-kth pruning dropping a neighbor breaks
    the row set."""
    df = Q.paa_series_df(spark, 160, length=64)
    pdf = synth.sequences_local(8)
    qs = [
        ("q0", K.paa(np.asarray(pdf["tokens"].iloc[0], dtype=np.float64), 64)),
        ("q1", K.paa(np.asarray(pdf["tokens"].iloc[7], dtype=np.float64), 64)),
    ]
    out = P.dtw_knn(df, qs, k=5, window=8)
    return out.select(
        "query_id",
        "rank",
        (~F.isnan("dist") & (F.col("dist") >= 0) & F.col("doc_id").isNotNull()).alias("ok"),
    )


@register(
    "subsequence_check",
    oracle="SELECT 10 AS n_results, true AS bounds_ok, true AS values_ok",
)
def subsequence_check(spark, sf_dir):
    """Invariant projection of subsequence search: top-10 results with
    0 <= start <= end < series length and nonnegative match values."""
    df = Q.paa_series_df(spark, 60, length=96)
    pdf = synth.sequences_local(4)
    q = K.paa(np.asarray(pdf["tokens"].iloc[3], dtype=np.float64), 96)[20:52]
    out = P.subsequence_search(df, q, k=10, window=16)
    return out.agg(
        F.count(F.lit(1)).cast("int").alias("n_results"),
        (
            (F.min("start") >= 0)
            & (F.sum((F.col("start") <= F.col("end")).cast("int")) == F.count(F.lit(1)))
            & (F.max("end") < 96)
        ).alias("bounds_ok"),
        (F.min("value") >= 0).alias("values_ok"),
    )
