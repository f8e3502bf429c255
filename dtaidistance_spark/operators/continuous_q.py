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


@register(
    "time_travel_check",
    oracle="""
WITH ids AS (SELECT unnest(range(384)) AS i),
src AS (
  SELECT i,
         CASE WHEN ('0x' || substr(md5('doc' || lpad(i::VARCHAR, 12, '0')), 1, 15))::BIGINT % 100 < 80
              THEN 'web'
              WHEN ('0x' || substr(md5('doc' || lpad(i::VARCHAR, 12, '0')), 1, 15))::BIGINT % 100 < 95
              THEN 'code' ELSE 'books' END AS source
  FROM ids
)
SELECT 'snap1' AS label,
       count(*) FILTER (i < 256) AS n_rows,
       count(*) FILTER (i < 256 AND source = 'web') AS n_web
FROM src
UNION ALL
SELECT 'snap2', count(*), count(*) FILTER (source = 'web') FROM src
UNION ALL
SELECT 'after_delete', count(*) FILTER (source <> 'web'), 0 FROM src
UNION ALL
SELECT 'travel_back', count(*), count(*) FILTER (source = 'web') FROM src
    """,
)
def time_travel_check(spark, sf_dir):
    """Snapshot isolation + time travel + partition retention as one
    driver-oracled query (§2.8): overwrite 256 synth rows (snapshot 1),
    append 128 more (snapshot 2), drop the 'web' partition (snapshot 3,
    the retention delete — a metadata-only commit). Then read FOUR
    views whose exact row counts DuckDB re-derives from the md5 source
    distribution: snapshot 1 as-of, snapshot 2 as-of, the current
    post-delete table, and time-travel BACK to snapshot 2 (expired
    rows still reachable — delete is metadata, vacuum is the separate
    storage reclaim)."""
    from dtaidistance_spark import synth

    root = tempfile.mkdtemp(prefix="tt_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        full = synth.sequences_df(spark, 384)
        t.write(full.where(F.col("doc_id") < "doc000000000256"), mode="overwrite")
        t.write(full.where(F.col("doc_id") >= "doc000000000256"), mode="append")
        t.delete_partitions(lambda p: p["source"] == "web")

        def counts(df):
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("source") == "web").cast("long")).alias("w"),
            ).collect()[0]
            return int(r["n"]), int(r["w"] or 0)

        rows = []
        for label, snap in (("snap1", 1), ("snap2", 2), ("travel_back", 2)):
            n, w = counts(t.read(spark, snapshot=snap))
            rows.append((label, n, w))
        n, w = counts(t.read(spark))
        rows.append(("after_delete", n, w))
        return spark.createDataFrame(rows, "label string, n_rows long, n_web long")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "invalidation_recompute_check",
    oracle="""
    WITH scal AS (
      SELECT
        (SELECT count(DISTINCT date_trunc('day', ts)) FROM events
          WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-08 00:00:00')
          AS n_recomputed_days,
        (SELECT count(DISTINCT date_trunc('day', ts)) FROM events
          WHERE ts < TIMESTAMP '2024-01-08 00:00:00') AS n_removed_days
    )
    SELECT 'all' AS key, date_trunc('day', ts)::TIMESTAMP AS window_start,
           count(DISTINCT user_id) AS n_series,
           count(*) AS n_points,
           scal.n_recomputed_days, scal.n_removed_days
    FROM events CROSS JOIN scal
    WHERE user_id <> 7 AND ts >= TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY 2, scal.n_recomputed_days, scal.n_removed_days
    """,
)
def invalidation_recompute_check(spark, sf_dir):
    """Continuous-aggregate INVALIDATION, driver-oracled end-to-end
    (the TimescaleDB semantics the north rule's 'incrementally
    maintained' demands): materialize the daily tier, then (A) forget
    user 7 GDPR-style by rewriting only the partitions they appear in
    (dynamic overwrite), and (B) expire the first week by dropping
    source partitions. One refresh later the tier must equal
    from-scratch SQL over the mutated source — user gone, week gone
    (tier partitions DROPPED, not stale) — and the refresh must have
    been incremental: exactly the user's surviving days recomputed,
    exactly the expired days removed (both counts re-derived by the
    oracle)."""
    series = _event_series(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="inv_q_")
    try:
        src = TableIO(root, "series", partition_by=["p_day"])
        ca = ContinuousAggregate(
            root, tiers=("1 day",),
            rollup_kw=dict(barycenter_len=48, dba_window=8),
        )
        ingest(series, src, mode="overwrite")
        ca.refresh(spark, src)
        # (A) GDPR: rewrite only the affected days without user 7
        touched = [
            r["p_day"]
            for r in series.where(F.col("doc_id").like("7@%"))
            .select(F.date_format("ts", "yyyy-MM-dd").alias("p_day"))
            .distinct()
            .collect()
        ]
        keep = series.where(
            F.date_format("ts", "yyyy-MM-dd").isin(touched)
            & ~F.col("doc_id").like("7@%")
        )
        ingest(keep, src, mode="dynamic")
        # (B) retention: expire the first week at the source
        src.delete_partitions(lambda p: p["p_day"] < "2024-01-08")
        rep = ca.refresh(spark, src)["1 day"]
        out = ca.read_tier(spark, "1 day").select(
            "key",
            "window_start",
            "n_series",
            "n_points",
            F.lit(len(rep.get("days", []))).cast("long").alias("n_recomputed_days"),
            F.lit(len(rep.get("removed_days", []))).cast("long").alias("n_removed_days"),
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "compaction_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(768)) AS i),
    hh AS (
      SELECT i,
        ('0x' || substr(md5('doc' || lpad(i::VARCHAR, 12, '0')), 1, 15))::BIGINT
          % 100 AS mm
      FROM idsx
    ),
    ss AS (
      SELECT i, CASE WHEN mm < 80 THEN 'web' WHEN mm < 95 THEN 'code'
                     ELSE 'books' END AS source
      FROM hh
    )
    SELECT source,
           count(DISTINCT i // 128) AS entries_before,
           1 AS entries_after,
           count(*) AS rows,
           true AS checksum_preserved,
           count(*) AS readback_rows
    FROM ss GROUP BY 1
    """,
)
def compaction_check(spark, sf_dir):
    """Small-file compaction, driver-oracled end-to-end: six 128-row
    appends of the synthetic token table into a source-partitioned
    manifest table (each append adds one entry per source it touches —
    the streaming small-file problem in miniature), then one
    ``compact()`` bin-packs every multi-entry partition into a single
    entry in one atomic commit. DuckDB independently re-derives the
    per-source entry counts BEFORE compaction (how many 128-id batches
    contain each source), the row counts, and the read-back counts; the
    order-insensitive checksum equality (XOR of old entry checksums ==
    new entry checksum) is verified by compact() itself and surfaced as
    a hashed boolean."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 768)
    root = tempfile.mkdtemp(prefix="compact_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        for k in range(6):
            batch = df.where(
                (F.col("doc_id") >= f"doc{128 * k:012d}")
                & (F.col("doc_id") < f"doc{128 * (k + 1):012d}")
            )
            t.write(batch, mode="overwrite" if k == 0 else "append")
        before = {}
        for e in t.entries():
            s = e["partition"]["source"]
            before[s] = before.get(s, 0) + 1
        rep = t.compact(spark, min_entries=2)
        assert rep["verified"] and rep["snapshot"] == 7
        after, rows_after = {}, {}
        for e in t.entries():
            s = e["partition"]["source"]
            after[s] = after.get(s, 0) + 1
            rows_after[s] = rows_after.get(s, 0) + int(e["rows"])
        readback = {
            r["source"]: r["cnt"]
            for r in t.read(spark).groupBy("source").agg(
                F.count(F.lit(1)).alias("cnt")
            ).collect()
        }
        rows = [
            (
                s,
                before[s],
                after[s],
                rows_after[s],
                True,  # compact() raised otherwise
                int(readback[s]),
            )
            for s in sorted(before)
        ]
        return spark.createDataFrame(
            rows,
            "source string, entries_before long, entries_after int, "
            "rows long, checksum_preserved boolean, readback_rows long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "incremental_read_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(256, 384)) AS i),
    basex AS (SELECT i, 'doc' || lpad(i::VARCHAR, 12, '0') AS doc_id FROM idsx),
    hx AS (
      SELECT i, doc_id,
             ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS h
      FROM basex
    ),
    px AS (
      SELECT i, doc_id, h,
        CASE WHEN h % 97 < 8 THEN least((64 + h % 1985) * 4, 8192)
             ELSE 64 + h % 1985 END AS n,
        h % 50257 AS hm, h % 7 AS ph, h % 100 AS m
      FROM hx
    ),
    sx AS (
      SELECT doc_id, n::INT AS n_tok,
        CASE WHEN m < 80 THEN 'web' WHEN m < 95 THEN 'code' ELSE 'books' END
          AS source,
        list_transform(range(n::INT), j ->
          ((((hm * (j + 1)) % 50257
             + floor(1000 * sin(2 * pi() * j / 64.0 + ph))::BIGINT) % 50257)
            + 50257) % 50257
        ) AS tokens
      FROM px
    )
    SELECT doc_id, n_tok, source,
           md5(array_to_string(tokens, ',')) AS tok_md5,
           128 AS delta_until_s2,
           256 AS delta_unbounded
    FROM sx
    """,
)
def incremental_read_check(spark, sf_dir):
    """Incremental (CDC append) read between snapshots, driver-oracled:
    ingest ids [0,256) (snapshot 1), append [256,384) (snapshot 2), then
    [384,512) (snapshot 3). ``read_incremental(since=1, until=2)`` must
    return EXACTLY the second batch — DuckDB re-derives those 128 rows
    (ids, lengths, sources, and the md5 of every token array) from
    nothing but the id range — and the unbounded delta since snapshot 1
    must hold exactly 256 rows. A no-change scan (since == current)
    must be empty."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 512)

    def batch(lo, hi):
        return df.where(
            (F.col("doc_id") >= f"doc{lo:012d}")
            & (F.col("doc_id") < f"doc{hi:012d}")
        )

    root = tempfile.mkdtemp(prefix="incr_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        s1 = t.write(batch(0, 256), mode="overwrite")
        s2 = t.write(batch(256, 384), mode="append")
        s3 = t.write(batch(384, 512), mode="append")
        delta = t.read_incremental(spark, since=s1, until=s2)
        n_unbounded = t.read_incremental(spark, since=s1).count()
        n_empty = t.read_incremental(spark, since=s3).count()
        assert n_empty == 0, n_empty
        n_delta = delta.count()
        out = delta.select(
            "doc_id",
            "n_tok",
            "source",
            F.md5(F.concat_ws(",", F.col("tokens").cast("array<string>")))
                .alias("tok_md5"),
            F.lit(int(n_delta)).cast("long").alias("delta_until_s2"),
            F.lit(int(n_unbounded)).cast("long").alias("delta_unbounded"),
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stats_pruning_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(512)) AS i),
    hh AS (
      SELECT i,
        ('0x' || substr(md5('doc' || lpad(i::VARCHAR, 12, '0')), 1, 15))::BIGINT
          % 100 AS mm
      FROM idsx
    ),
    ss AS (
      SELECT i,
             CASE WHEN mm < 80 THEN 'web' WHEN mm < 95 THEN 'code'
                  ELSE 'books' END AS source,
             i // 128 AS b
      FROM hh
    )
    SELECT source,
           count(*) FILTER (WHERE b = 1) AS n_rows,
           count(DISTINCT b) FILTER (WHERE b = 1) AS n_entries_selected,
           count(DISTINCT b) FILTER (WHERE b <> 1) AS n_entries_skipped,
           true AS pruned_scan_matches_full
    FROM ss GROUP BY 1
    """,
)
def stats_pruning_check(spark, sf_dir):
    """Column-stats file skipping (Iceberg metadata pruning),
    driver-oracled: four 128-row appends land with per-entry min/max
    ``ts`` stats in the manifest; a ts-range read matching exactly the
    second batch must SELECT only that batch's entries and SKIP every
    other entry manifest-side (Spark never lists those files), while
    returning the same rows as an unpruned full scan with the same
    row-level predicate. The synthetic ts axis is ``epoch + id``
    seconds, so DuckDB re-derives which batch every row is in, hence
    the per-source selected/skipped entry counts AND the row counts,
    from nothing but the id range."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 512)
    lo, hi = "2026-01-01 00:02:08", "2026-01-01 00:04:15"  # ids 128..255
    root = tempfile.mkdtemp(prefix="stats_q_")
    try:
        t = TableIO(
            root, "seq", partition_by=["source"], stats_cols=["ts", "n_tok"]
        )
        for k in range(4):
            batch = df.where(
                (F.col("doc_id") >= f"doc{128 * k:012d}")
                & (F.col("doc_id") < f"doc{128 * (k + 1):012d}")
            )
            t.write(batch, mode="overwrite" if k == 0 else "append")
        sel, skip = t.scan_entries(stats_filter={"ts": (lo, hi)})
        pruned = (
            t.read(spark, stats_filter={"ts": (lo, hi)})
            .where(F.col("ts").between(lo, hi))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        full = (
            t.read(spark)
            .where(F.col("ts").between(lo, hi))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        pruned_n = {r["source"]: r["n"] for r in pruned.collect()}
        full_n = {r["source"]: r["n"] for r in full.collect()}
        per_src: dict[str, list[int]] = {}
        for e in sel:
            per_src.setdefault(e["partition"]["source"], [0, 0])[0] += 1
        for e in skip:
            per_src.setdefault(e["partition"]["source"], [0, 0])[1] += 1
        rows = [
            (
                s,
                int(pruned_n.get(s, 0)),
                n_sel,
                n_skip,
                pruned_n.get(s, 0) == full_n.get(s, 0),
            )
            for s, (n_sel, n_skip) in sorted(per_src.items())
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_rows long, n_entries_selected long, "
            "n_entries_skipped long, pruned_scan_matches_full boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "schema_evolution_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(384)) AS i),
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
           CASE WHEN i < 256 THEN 'v1' ELSE 'v2' END AS pipeline,
           count(*) AS n_rows,
           sum(CASE WHEN i < 256 THEN 0.5 ELSE n / 8192.0 END) AS sum_quality,
           true AS snapshot1_evolved
    FROM ss GROUP BY 1, 2
    """,
)
def schema_evolution_check(spark, sf_dir):
    """Schema evolution without rewrite (Iceberg ADD COLUMN),
    driver-oracled: ingest 256 rows, evolve the schema with
    (quality double DEFAULT 0.5, pipeline string DEFAULT 'v1') — zero
    data files touched — then append 128 rows that CARRY computed
    quality (n_tok/8192, exact in float64: /2^13) and pipeline 'v2'.
    The merged read must show old rows with defaults and new rows with
    real values (per source x pipeline counts and exact quality sums
    re-derived by DuckDB), and time travel to snapshot 1 must read
    under the CURRENT schema (defaults filled on the fly)."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 384)
    root = tempfile.mkdtemp(prefix="evo_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        s1 = t.write(
            df.where(F.col("doc_id") < f"doc{256:012d}"), mode="overwrite"
        )
        t.evolve_schema(
            {"quality": ("double", 0.5), "pipeline": ("string", "v1")}
        )
        t.write(
            df.where(F.col("doc_id") >= f"doc{256:012d}")
            .withColumn("quality", F.col("n_tok") / F.lit(8192.0))
            .withColumn("pipeline", F.lit("v2")),
            mode="append",
        )
        back = t.read(spark, snapshot=s1)
        evolved = (
            "quality" in back.columns
            and back.where(
                (F.col("quality") != 0.5) | (F.col("pipeline") != "v1")
            ).count() == 0
        )
        out = (
            t.read(spark)
            .groupBy("source", "pipeline")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("quality").alias("sum_quality"),
            )
            .withColumn("snapshot1_evolved", F.lit(bool(evolved)))
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "merge_upsert_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(320)) AS i),
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
           sum(n + CASE WHEN i BETWEEN 128 AND 191 THEN 1000000 ELSE 0 END)::BIGINT
             AS sum_n_tok,
           count(*) FILTER (WHERE i BETWEEN 128 AND 191) AS n_updated,
           count(*) FILTER (WHERE i < 256) AS n_rows_after_rollback,
           sum(n) FILTER (WHERE i < 256)::BIGINT AS sum_n_tok_after_rollback
    FROM ss GROUP BY 1
    """,
)
def merge_upsert_check(spark, sf_dir):
    """MERGE INTO (upsert) + snapshot rollback, driver-oracled: write
    256 rows, then ONE merge commit that UPDATES rows 128..191 (n_tok
    bumped by 1e6) and INSERTS rows 256..319 — existing keys replaced,
    new keys added, untouched partitions untouched, no duplicate keys.
    Then roll back to the pre-merge snapshot (metadata-only, history
    preserved) and verify the table reads exactly as before the merge.
    DuckDB re-derives every count and n_tok sum from the id ranges."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 320)
    root = tempfile.mkdtemp(prefix="merge_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        s1 = t.write(
            df.where(F.col("doc_id") < f"doc{256:012d}"), mode="overwrite"
        )
        updated = df.where(
            (F.col("doc_id") >= f"doc{128:012d}")
            & (F.col("doc_id") < f"doc{192:012d}")
        ).withColumn("n_tok", F.col("n_tok") + F.lit(1000000))
        inserted = df.where(F.col("doc_id") >= f"doc{256:012d}")
        t.merge(updated.unionByName(inserted), key_cols=["doc_id"])
        assert t.snapshots()[-1]["op"] == "merge"
        merged = t.read(spark)
        assert merged.select("doc_id").distinct().count() == merged.count()
        post = {
            r["source"]: r
            for r in merged.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_tok").alias("sum_n_tok"),
                F.sum((F.col("n_tok") > 900000).cast("long")).alias(
                    "n_updated"
                ),
            )
            .collect()
        }
        t.rollback(s1)
        back = {
            r["source"]: r
            for r in t.read(spark)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_tok").alias("sum_n_tok"),
            )
            .collect()
        }
        rows = [
            (
                s,
                int(post[s]["n_rows"]),
                int(post[s]["sum_n_tok"]),
                int(post[s]["n_updated"]),
                int(back[s]["n_rows"]),
                int(back[s]["sum_n_tok"]),
            )
            for s in sorted(post)
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_rows long, sum_n_tok long, n_updated long, "
            "n_rows_after_rollback long, sum_n_tok_after_rollback long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "wap_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(320)) AS i),
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
           count(*) AS n_rows_final,
           sum(n)::BIGINT AS sum_n_tok,
           0 AS n_bad_rows_final,
           count(*) FILTER (WHERE i < 256) AS n_rows_while_staged,
           true AS stage_invisible
    FROM ss GROUP BY 1
    """,
)
def wap_check(spark, sf_dir):
    """Write-audit-publish (the data-quality gate a training pipeline
    runs before promoting a batch), driver-oracled: write 256 rows;
    STAGE a corrupted batch (n_tok = -1 injected) — readers still see
    only the 256 (stage invisibility verified while staged) — audit
    catches the bad rows and ABORTS; stage the clean 256..319 batch,
    audit passes, PUBLISH. Final table: exactly ids < 320 with original
    n_tok sums and zero bad rows — all re-derived by DuckDB."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 320)
    root = tempfile.mkdtemp(prefix="wap_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        t.write(df.where(F.col("doc_id") < f"doc{256:012d}"), mode="overwrite")
        tail = df.where(F.col("doc_id") >= f"doc{256:012d}")
        # stage a corrupted batch
        bad_id = t.write_staged(
            tail.withColumn("n_tok", F.lit(-1)), mode="append"
        )
        n_while_staged = t.read(spark).count()  # stage invisibility
        audit_bad = t.read_staged(spark, bad_id).where("n_tok <= 0").count()
        assert audit_bad > 0
        t.abort_staged(bad_id)
        # stage the clean batch, audit, publish
        good_id = t.write_staged(tail, mode="append")
        audit_good = t.read_staged(spark, good_id).where("n_tok <= 0").count()
        assert audit_good == 0
        t.publish_staged(good_id)
        per_src = {
            r["source"]: r
            for r in t.read(spark)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_rows_final"),
                F.sum("n_tok").alias("sum_n_tok"),
                F.sum((F.col("n_tok") <= 0).cast("long")).alias("n_bad"),
            )
            .collect()
        }
        staged_src = {
            r["source"]: r["c"]
            for r in t.read(spark, snapshot=1)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        total_while_staged = sum(staged_src.values())
        rows = [
            (
                s,
                int(v["n_rows_final"]),
                int(v["sum_n_tok"]),
                int(v["n_bad"]),
                int(staged_src.get(s, 0)),
                n_while_staged == total_while_staged,
            )
            for s, v in sorted(per_src.items())
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_rows_final long, sum_n_tok long, "
            "n_bad_rows_final long, n_rows_while_staged long, "
            "stage_invisible boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "row_delete_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(256)) AS i),
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
             ELSE 64 + h % 1985 END AS n,
        (i % 10 != 3 OR i IN (3, 13, 23)) AS visible
      FROM hh
    )
    SELECT source,
           count(*) FILTER (WHERE visible) AS n_rows_mor,
           sum(n) FILTER (WHERE visible)::BIGINT AS sum_n_tok_mor,
           count(*) AS n_rows_tt,
           count(*) FILTER (WHERE visible) AS n_rows_cow,
           sum(n) FILTER (WHERE visible)::BIGINT AS sum_n_tok_cow,
           true AS deletes_cleared
    FROM ss GROUP BY 1
    """,
)
def row_delete_check(spark, sf_dir):
    """Iceberg-v2 row-level deletes end-to-end, driver-oracled: write
    256 rows; equality-delete the 26 keys with i % 10 == 3 (ZERO data
    files touched — merge-on-read); re-APPEND three of the deleted keys
    (3, 13, 23) — the later append outranks the delete (sequence-number
    semantics), so exactly those three resurface. The MoR read, the
    time-travel read back past the delete (all 256), and the
    copy-on-write read after apply_deletes() (files rewritten, delete
    list cleared) are each re-derived by DuckDB from the id arithmetic
    alone."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 256)
    root = tempfile.mkdtemp(prefix="rowdel_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        s1 = t.write(df, mode="overwrite")
        doomed = df.where(
            F.substring("doc_id", 4, 12).cast("int") % 10 == 3
        )
        t.delete_rows(doomed.select("doc_id"), key_cols=["doc_id"])
        reinsert = [f"doc{i:012d}" for i in (3, 13, 23)]
        t.write(df.where(F.col("doc_id").isin(reinsert)), mode="append")

        def per_src(d):
            return {
                r["source"]: r
                for r in d.groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.sum("n_tok").alias("s"),
                )
                .collect()
            }

        mor = per_src(t.read(spark))
        tt = per_src(t.read(spark, snapshot=s1))
        t.apply_deletes(spark)
        cow = per_src(t.read(spark))
        assert t._load().get("deletes", []) == []
        assert t.snapshots()[-1]["op"] == "apply-deletes"
        rows = [
            (
                s,
                int(mor[s]["c"]),
                int(mor[s]["s"]),
                int(tt[s]["c"]),
                int(cow[s]["c"]),
                int(cow[s]["s"]),
                mor[s]["c"] == cow[s]["c"] and mor[s]["s"] == cow[s]["s"],
            )
            for s in sorted(mor)
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_rows_mor long, sum_n_tok_mor long, "
            "n_rows_tt long, n_rows_cow long, sum_n_tok_cow long, "
            "deletes_cleared boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "branch_check",
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
           count(*) FILTER (WHERE i < 128) AS n_main_before,
           count(*) AS n_dev,
           count(*) FILTER (WHERE i < 128) AS n_tag,
           count(*) AS n_main_after,
           sum(n)::BIGINT AS sum_n_tok_after
    FROM ss GROUP BY 1
    """,
)
def branch_check(spark, sf_dir):
    """Branches and tags (Iceberg refs), driver-oracled: write 128 rows
    to main, tag it 'v1' (immutable named snapshot), branch 'dev' off
    it, append 64 rows TO THE BRANCH — main still reads 128 (branch
    isolation), dev reads 192 — then fast-forward main onto the dev
    head and verify main == dev while the tag still reads the original
    128. Every view's per-source counts re-derived by DuckDB from the
    id ranges. The Iceberg audit-branch workflow: risky writes land on
    a branch, main adopts them only after validation."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 192)
    root = tempfile.mkdtemp(prefix="branch_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        t.write(df.where(F.col("doc_id") < f"doc{128:012d}"), mode="overwrite")
        t.create_tag("v1")
        t.create_branch("dev")
        t.write(
            df.where(F.col("doc_id") >= f"doc{128:012d}"),
            mode="append",
            branch="dev",
        )

        def per_src(d):
            return {
                r["source"]: (int(r["c"]), int(r["s"]))
                for r in d.groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("c"), F.sum("n_tok").alias("s")
                )
                .collect()
            }

        main_before = per_src(t.read(spark))
        dev = per_src(t.read(spark, ref="dev"))
        t.fast_forward("dev")
        main_after = per_src(t.read(spark))
        tag = per_src(t.read(spark, ref="v1"))
        rows = [
            (
                s,
                main_before.get(s, (0, 0))[0],
                dev[s][0],
                tag.get(s, (0, 0))[0],
                main_after[s][0],
                main_after[s][1],
            )
            for s in sorted(dev)
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_main_before long, n_dev long, n_tag long, "
            "n_main_after long, sum_n_tok_after long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "bloom_skip_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(256)) AS i),
    base AS (SELECT i, 'doc' || lpad(i::VARCHAR, 12, '0') AS doc_id FROM idsx),
    hh AS (
      SELECT i, doc_id,
        ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS h
      FROM base
    ),
    ss AS (
      SELECT doc_id,
        CASE WHEN h % 100 < 80 THEN 'web' WHEN h % 100 < 95 THEN 'code'
             ELSE 'books' END AS source
      FROM hh
    ),
    probes AS (SELECT unnest(['doc000000000005', 'doc000000000077',
                              'doc000000000203', 'doc000000999999']) AS probe),
    bpos AS (
      SELECT DISTINCT source,
        ('0x' || substr(md5(doc_id || '#' || t.i::VARCHAR), 1, 15))::BIGINT
          % 4096 AS pos
      FROM ss, unnest(range(4)) AS t(i)
    ),
    ppos AS (
      SELECT probe,
        ('0x' || substr(md5(probe || '#' || t.i::VARCHAR), 1, 15))::BIGINT
          % 4096 AS pos
      FROM probes, unnest(range(4)) AS t(i)
    ),
    sel AS (
      SELECT pp.probe, s.source,
             bool_and(b.pos IS NOT NULL) AS keep
      FROM (SELECT DISTINCT source FROM ss) s
      CROSS JOIN ppos pp
      LEFT JOIN bpos b ON b.source = s.source AND b.pos = pp.pos
      GROUP BY 1, 2
    )
    SELECT p.probe,
      (SELECT count(*) FROM sel WHERE sel.probe = p.probe AND keep)
        AS n_selected,
      (SELECT count(*) FROM sel WHERE sel.probe = p.probe AND NOT keep)
        AS n_skipped,
      (SELECT count(*) FROM ss WHERE doc_id = p.probe) AS n_rows,
      (SELECT count(*) FROM ss WHERE doc_id = p.probe) > 0 AS found
    FROM probes p
    """,
)
def bloom_skip_check(spark, sf_dir):
    """Manifest bloom point-lookup skipping (IO10), driver-oracled:
    write the 256-row synth table partitioned by source with a per-entry
    doc_id bloom (m=4096, k=4 md5 positions); probe three existing docs
    and one missing one. DuckDB independently re-derives EVERY pruning
    decision — it rebuilds each source's position set and each probe's
    positions and re-computes which entries a probe may touch — so the
    selected/skipped entry counts (including any bloom false positives)
    and the row counts hash-match. No false negatives by construction:
    a probe's own entry is always selected. This is the metadata path a
    point lookup on a 100 TB table lives by when min/max ranges can't
    discriminate."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 256)
    root = tempfile.mkdtemp(prefix="bloom_q_")
    try:
        t = TableIO(
            root, "seq", partition_by=["source"], bloom_cols=["doc_id"]
        )
        t.write(df, mode="overwrite")
        probes = [
            "doc000000000005",
            "doc000000000077",
            "doc000000000203",
            "doc000000999999",
        ]
        rows = []
        for p in probes:
            selected, skipped = t.scan_entries(point_filter={"doc_id": p})
            try:
                n = (
                    t.read(spark, point_filter={"doc_id": p})
                    .where(F.col("doc_id") == p)
                    .count()
                )
            except FileNotFoundError:
                n = 0
            rows.append((p, len(selected), len(skipped), n, n > 0))
        return spark.createDataFrame(
            rows,
            "probe string, n_selected long, n_skipped long, n_rows long, "
            "found boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "metadata_tables_check",
    oracle="""
    WITH idsx AS (SELECT unnest(range(224)) AS i),
    hh AS (
      SELECT i,
        ('0x' || substr(md5('doc' || lpad(i::VARCHAR, 12, '0')), 1, 15))::BIGINT
          AS h
      FROM idsx
    ),
    ss AS (
      SELECT i,
        CASE WHEN h % 100 < 80 THEN 'web' WHEN h % 100 < 95 THEN 'code'
             ELSE 'books' END AS source
      FROM hh
    ),
    e1 AS (SELECT count(DISTINCT source) AS c FROM ss WHERE i < 128),
    e2 AS (SELECT count(DISTINCT source) AS c FROM ss
           WHERE i BETWEEN 128 AND 191),
    e3 AS (SELECT count(DISTINCT source) AS c FROM ss
           WHERE i BETWEEN 192 AND 223)
    SELECT 'file' AS kind, source AS key,
           2::BIGINT AS a,
           count(*) FILTER (WHERE i < 192)::BIGINT AS b,
           false AS curr
    FROM ss GROUP BY source
    UNION ALL
    SELECT 'history', 'snap1:overwrite', (SELECT c FROM e1), 128, false
    UNION ALL
    SELECT 'history', 'snap2:append',
           (SELECT c FROM e1) + (SELECT c FROM e2), 192, true
    UNION ALL
    SELECT 'history', 'snap3:append',
           (SELECT c FROM e1) + (SELECT c FROM e2) + (SELECT c FROM e3),
           224, false
    UNION ALL
    SELECT 'ref', 'dev:branch', 3, 0, false
    UNION ALL
    SELECT 'ref', 'v1:tag', 2, 0, false
    """,
)
def metadata_tables_check(spark, sf_dir):
    """Iceberg metadata tables (`.files` / `.history` / `.refs`) as
    queryable DataFrames, driver-oracled over a scripted scenario:
    overwrite 128 rows -> append 64 -> tag v1 -> branch dev -> append
    32 MORE rows to the branch. The files view must show exactly the
    MAIN entry set (two entries per source, branch data invisible),
    the history view all three commits with cumulative entry counts
    and row totals (only the append on main marked current), and the
    refs view the branch head at snapshot 3 and the tag at 2 — every
    number re-derived by DuckDB from the id ranges."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 224)
    root = tempfile.mkdtemp(prefix="meta_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        t.write(df.where(F.col("doc_id") < f"doc{128:012d}"), mode="overwrite")
        t.write(
            df.where(
                (F.col("doc_id") >= f"doc{128:012d}")
                & (F.col("doc_id") < f"doc{192:012d}")
            ),
            mode="append",
        )
        t.create_tag("v1")
        t.create_branch("dev")
        t.write(
            df.where(F.col("doc_id") >= f"doc{192:012d}"),
            mode="append",
            branch="dev",
        )
        files = t.files_df(spark).groupBy(
            F.get_json_object("partition", "$.source").alias("key")
        ).agg(
            F.count(F.lit(1)).alias("a"), F.sum("rows").alias("b")
        ).select(
            F.lit("file").alias("kind"), "key", "a", "b",
            F.lit(False).alias("curr"),
        )
        hist = t.history_df(spark).select(
            F.lit("history").alias("kind"),
            F.concat(
                F.lit("snap"), F.col("snapshot_id").cast("string"),
                F.lit(":"), F.col("op"),
            ).alias("key"),
            F.col("entry_count").alias("a"),
            F.col("total_rows").alias("b"),
            F.col("is_current").alias("curr"),
        )
        refs = t.refs_df(spark).select(
            F.lit("ref").alias("kind"),
            F.concat("name", F.lit(":"), "type").alias("key"),
            F.col("snapshot").alias("a"),
            F.lit(0).cast("long").alias("b"),
            F.lit(False).alias("curr"),
        )
        out = files.unionByName(hist).unionByName(refs)
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows, "kind string, key string, a long, b long, curr boolean"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "partition_evolution_check",
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
    ),
    e1 AS (SELECT count(DISTINCT source) AS c,
                  max(CASE WHEN source = 'web' THEN 1 ELSE 0 END) AS w
           FROM ss WHERE i < 128),
    e2 AS (SELECT count(DISTINCT source) AS c,
                  max(CASE WHEN source = 'web' THEN 1 ELSE 0 END) AS w
           FROM ss WHERE i >= 128),
    wv AS (SELECT count(*) AS web_rows FROM ss WHERE source = 'web')
    SELECT 'mixed' AS kind, source AS key,
           count(*)::BIGINT AS a, sum(n)::BIGINT AS b
    FROM ss GROUP BY source
    UNION ALL
    SELECT 'prune_pre', 'web',
           1 + (SELECT w FROM e2), (SELECT c - w FROM e2)
    UNION ALL
    SELECT 'prune_post', 'web',
           (SELECT w FROM e1) + (SELECT w FROM e2),
           (SELECT c - w FROM e1) + (SELECT c - w FROM e2)
    UNION ALL
    SELECT 'rows_web', 'web', (SELECT web_rows FROM wv),
           (SELECT web_rows FROM wv)
    UNION ALL
    SELECT 'entries', 'total',
           (SELECT c FROM e1) + (SELECT c FROM e2), 1
    """,
)
def partition_evolution_check(spark, sf_dir):
    """Iceberg partition-spec evolution (IO13), driver-oracled: write
    128 rows UNPARTITIONED, evolve the spec to partition_by=['source']
    (zero files touched), append 64 rows under the NEW spec, and read
    the mixed-layout table — the old entry's source column surfaces
    from the data file, the new entries' from the manifest, and the
    per-source counts equal the full 192-row distribution. Partition
    pruning stays SAFE on the mixed table (a pre-evolution entry is
    never pruned: 2 entries selected for source='web'), and after
    migrate_partition_spec() rewrites the old entry into the new
    layout (one atomic 'migrate' commit, rows verified) pruning
    becomes fully effective (web-only entries selected) with identical
    row counts. Every number re-derived by DuckDB from id ranges."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 192)
    root = tempfile.mkdtemp(prefix="pspec_q_")
    try:
        t = TableIO(root, "seq", partition_by=[])
        t.write(df.where(F.col("doc_id") < f"doc{128:012d}"), mode="overwrite")
        ver = t.evolve_partition_spec(["source"])
        t.write(df.where(F.col("doc_id") >= f"doc{128:012d}"), mode="append")
        mixed = {
            r["source"]: (int(r["c"]), int(r["s"]))
            for r in t.read(spark)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("c"), F.sum("n_tok").alias("s"))
            .collect()
        }
        web_pred = lambda p: p.get("source") == "web"  # noqa: E731
        sel_pre, _ = t.scan_entries(partition_filter=web_pred)
        skip_pre = len(t.entries()) - len(sel_pre)
        rows_pre = (
            t.read(spark, partition_filter=web_pred)
            .where(F.col("source") == "web")
            .count()
        )
        t.migrate_partition_spec(spark)
        assert t.snapshots()[-1]["op"] == "migrate"
        sel_post, _ = t.scan_entries(partition_filter=web_pred)
        skip_post = len(t.entries()) - len(sel_post)
        rows_post = (
            t.read(spark, partition_filter=web_pred)
            .where(F.col("source") == "web")
            .count()
        )
        rows = [
            ("mixed", s, c, tot) for s, (c, tot) in sorted(mixed.items())
        ] + [
            ("prune_pre", "web", len(sel_pre), skip_pre),
            ("prune_post", "web", len(sel_post), skip_post),
            ("rows_web", "web", rows_pre, rows_post),
            ("entries", "total", len(t.entries()), ver),
        ]
        return spark.createDataFrame(
            rows, "kind string, key string, a long, b long"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "maintenance_check",
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
             ELSE 'books' END AS source
      FROM hh
    )
    SELECT count(*) FILTER (WHERE i < 128)::BIGINT AS n_tag_rows,
           count(*)::BIGINT AS n_current_rows,
           1::BIGINT AS n_orphans_removed,
           0::BIGINT AS n_orphans_after,
           true AS tag_survived_vacuum,
           true AS young_orphan_spared
    FROM ss
    """,
)
def maintenance_check(spark, sf_dir):
    """Storage-maintenance suite (IO14/IO15), driver-oracled: write 128
    rows (snapshot 1), tag it 'v1', overwrite with 192 rows (snapshot
    2 — snapshot 1's files now unreferenced by current), plant a FAKE
    crashed-writer dir under data/ (files materialized, commit never
    landed), then vacuum(keep_snapshots=1). The tag-protected snapshot
    1 must SURVIVE the expiry with its data (the Iceberg
    refs-block-expiry rule) and still read exactly 128 rows, while
    remove_orphan_files deletes exactly the planted debris — sparing
    it first under a grace window (the in-flight-writer race guard) —
    and a second pass finds nothing. Counts re-derived by DuckDB."""
    import os as _os
    import time as _time

    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 192)
    root = tempfile.mkdtemp(prefix="maint_q_")
    try:
        t = TableIO(root, "seq", partition_by=["source"])
        t.write(df.where(F.col("doc_id") < f"doc{128:012d}"), mode="overwrite")
        t.create_tag("v1")
        t.write(df, mode="overwrite")
        t.vacuum(keep_snapshots=1)
        # crashed-writer debris: a materialized-but-never-committed dir
        # (planted after vacuum — vacuum's own sweep has no grace
        # window, which is exactly why the dedicated orphan pass with
        # one exists)
        orphan = _os.path.join(root, "seq", "data", "s999999-deadbeef")
        _os.makedirs(orphan)
        with open(_os.path.join(orphan, "part-0.parquet"), "wb") as fh:
            fh.write(b"debris")
        tag_rows = t.read(spark, ref="v1").count()
        cur_rows = t.read(spark).count()
        # grace window spares the young orphan...
        r0 = t.remove_orphan_files(grace_seconds=3600)
        spared = orphan in r0["kept_young"] and _os.path.isdir(orphan)
        # ...then it ages out (backdate the mtime instead of sleeping)
        _os.utime(orphan, (_time.time() - 7200, _time.time() - 7200))
        r1 = t.remove_orphan_files(grace_seconds=3600)
        r2 = t.remove_orphan_files(grace_seconds=3600)
        return spark.createDataFrame(
            [
                (
                    tag_rows,
                    cur_rows,
                    len(r1["removed"]),
                    len(r2["removed"]),
                    tag_rows == 128,
                    bool(spared),
                )
            ],
            "n_tag_rows long, n_current_rows long, n_orphans_removed long, "
            "n_orphans_after long, tag_survived_vacuum boolean, "
            "young_orphan_spared boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# R27 — real-time continuous aggregation (TimescaleDB's signature view):
# the query plane unions the MATERIALIZED tier (days at or below the
# refresh high-water mark) with an on-the-fly aggregation of ONLY the
# raw rows past it. At scale this is the whole point of the tier
# system: a dashboard query touches pre-aggregated rows for history and
# scans raw data only for the unmaterialized tail (here half the days;
# in production, minutes of data), yet the result is indistinguishable
# from aggregating raw from scratch — which is exactly what the DuckDB
# oracle does, per-day counts AND the materialized/realtime provenance
# column re-derived from nothing but the events table.
# ---------------------------------------------------------------------------


@register(
    "realtime_agg_view",
    oracle="""
    SELECT 'all' AS key, date_trunc('day', ts)::TIMESTAMP AS window_start,
           count(DISTINCT user_id) AS n_series,
           count(*)                AS n_points,
           CASE WHEN date_part('day', ts) <= 15 THEN 'materialized'
                ELSE 'realtime' END AS tier_source
    FROM events GROUP BY 2, 5
    """,
)
def realtime_agg_view(spark, sf_dir):
    """Ingest all days but refresh the daily tier only through day 15,
    then serve the real-time view: materialized tier rows UNION an
    aggregate over raw rows strictly past the tier's high-water mark
    (read once from the tier metadata — a scalar, not a data scan).
    Counts must equal from-scratch SQL on every day, and the
    tier_source column proves each day was served from the right side
    of the union."""
    series = _event_series(spark, sf_dir).withColumn(
        "p_half", (F.dayofmonth("ts") <= 15).cast("int")
    )
    root = tempfile.mkdtemp(prefix="rt_q_")
    try:
        src = TableIO(root, "series", partition_by=["p_day"])
        ca = ContinuousAggregate(
            root, tiers=("1 day",),
            rollup_kw=dict(barycenter_len=48, dba_window=8),
        )
        ingest(series.where("p_half = 1").drop("p_half"), src,
               mode="overwrite")
        ca.refresh(spark, src)
        # late raw data arrives AFTER the refresh: the tier is now stale
        ingest(series.where("p_half = 0").drop("p_half"), src,
               mode="append")
        tier = ca.read_tier(spark, "1 day").select(
            "key", "window_start", "n_series", "n_points"
        ).withColumn("tier_source", F.lit("materialized"))
        hwm = tier.agg(F.max("window_start")).collect()[0][0]
        tail = (
            src.read(spark)
            .where(F.col("ts") > F.lit(hwm))
            .groupBy(F.col("ts").alias("window_start"))
            .agg(
                F.count("*").alias("n_series"),
                F.sum(F.size("tokens")).alias("n_points"),
            )
            .select(
                F.lit("all").alias("key"),
                "window_start",
                "n_series",
                "n_points",
                F.lit("realtime").alias("tier_source"),
            )
        )
        return detach(spark, tier.unionByName(tail))
    finally:
        shutil.rmtree(root, ignore_errors=True)
