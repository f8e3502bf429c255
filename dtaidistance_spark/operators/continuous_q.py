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


@register(
    "lineage_resume_check",
    oracle="""
WITH ids AS (SELECT unnest(range(256)) AS i),
base AS (SELECT i, 'doc' || lpad(i::VARCHAR, 12, '0') AS doc_id FROM ids),
h AS (SELECT i, ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS hh FROM base),
m AS (SELECT i, hh % 100 AS m FROM h)
SELECT CASE WHEN m < 80 THEN 'web' WHEN m < 95 THEN 'code' ELSE 'books' END
         AS source,
       count(*) AS rows,
       true AS checksum_stable,
       2 AS n_snapshots,
       true AS has_metrics
FROM m GROUP BY 1
    """,
)
def lineage_resume_check(spark, sf_dir):
    """North-rule lineage + resume evidence, driver-oracled: ingest the
    synthetic token table into a manifest table partitioned by source
    (snapshot 1), then REPLAY one partition's ingest as a dynamic
    overwrite with identical data (snapshot 2 — the checkpoint-resume
    shape: a retried partition commits idempotently). The per-partition
    lineage ROW COUNTS must equal DuckDB's independent re-derivation of
    the synth table's source distribution, the replayed partition's
    order-insensitive checksum must be UNCHANGED across snapshots
    (bit_xor of row hashes — partitioning/order independent, which is
    exactly what makes retries verifiable), and every snapshot carries
    wall-time metrics."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 256)
    root = tempfile.mkdtemp(prefix="lin_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        t.write(df, mode="overwrite")
        # resume/retry: re-commit ONE partition with identical data
        t.write(df.where(F.col("source") == "web"), mode="dynamic")
        snaps = t.snapshots()
        by_part_1 = {
            e["partition"]["source"]: e["checksum"]
            for e in snaps[0]["added"]
        }
        rows = []
        for e in t.entries():
            src = e["partition"]["source"]
            stable = (src != "web") or (e["checksum"] == by_part_1["web"])
            rows.append(
                (
                    src,
                    int(e["rows"]),
                    bool(stable),
                    len(snaps),
                    all(s.get("wall_ms", -1) >= 0 for s in snaps),
                )
            )
        return spark.createDataFrame(
            rows,
            "source string, rows long, checksum_stable boolean, "
            "n_snapshots int, has_metrics boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
