"""Registry query for continuous aggregates (R14): run the full
ingest -> incremental refresh -> read-tier pipeline on the shared
events table and return the materialized tier's group cardinalities,
which the DuckDB oracle recomputes from scratch (the driver-checkable
projection of the invalidation-window refresh)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.flagship import _event_series
from dtaidistance_spark.operators.qutil import detach
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.plans.continuous import ContinuousAggregate, ingest
from dtaidistance_spark.sources.tableio import TableIO


@register(
    "continuous_agg_counts",
    oracle="""
    SELECT 'all' AS key, date_trunc('day', ts)::TIMESTAMP AS window_start,
           count(DISTINCT user_id) AS n_series,
           count(*)                AS n_points
    FROM events GROUP BY 2
    """,
)
def continuous_agg_counts(spark, sf_dir):
    """Materialize the daily continuous aggregate of per-user activity
    curves in two incremental refreshes (first half of the days, then
    the rest), then read the tier table back — counts must equal
    from-scratch SQL."""
    series = _event_series(spark, sf_dir).withColumn(
        "p_half", (F.dayofmonth("ts") <= 15).cast("int")
    )
    root = tempfile.mkdtemp(prefix="ca_q_")
    try:
        src = TableIO(root, "series", partition_by=["p_day"])
        ca = ContinuousAggregate(
            root, tiers=("1 day",),
            rollup_kw=dict(barycenter_len=48, dba_window=8),
        )
        ingest(series.where("p_half = 1").drop("p_half"), src, mode="overwrite")
        ca.refresh(spark, src)
        ingest(series.where("p_half = 0").drop("p_half"), src, mode="append")
        ca.refresh(spark, src)
        out = ca.read_tier(spark, "1 day").select(
            "key", "window_start", "n_series", "n_points"
        )
        return detach(spark, out)  # survive rmtree of the temp tier files
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "retention_expiry_counts",
    oracle="""
    SELECT 'all' AS key, date_trunc('day', ts)::TIMESTAMP AS window_start,
           count(DISTINCT user_id) AS n_series,
           count(*)                AS n_points
    FROM events
    WHERE date_trunc('day', ts) >= DATE '2024-01-16'
    GROUP BY 2
    """,
)
def retention_expiry_counts(spark, sf_dir):
    """Retention policy end-to-end, DuckDB-oracled: materialize the
    daily continuous aggregate, expire p_day partitions older than the
    keep window (metadata-only delete_partitions commit), read the tier
    back — surviving windows must equal the from-scratch SQL filtered
    at the cutoff. Events span 2024-01-01..30; now=2024-01-31 with
    keep='15 days' -> cutoff 2024-01-16."""
    import shutil
    import tempfile

    from dtaidistance_spark.plans.retention import apply_retention

    series = _event_series(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ret_q_")
    try:
        src = TableIO(root, "series", partition_by=["p_day"])
        ca = ContinuousAggregate(
            root, tiers=("1 day",),
            rollup_kw=dict(barycenter_len=48, dba_window=8),
        )
        ingest(series, src, mode="overwrite")
        ca.refresh(spark, src)
        apply_retention(ca, {"1 day": "15 days"}, now="2024-01-31")
        out = ca.read_tier(spark, "1 day").select(
            "key", "window_start", "n_series", "n_points"
        )
        return detach(spark, out)  # survive rmtree of the temp tier files
    finally:
        shutil.rmtree(root, ignore_errors=True)
