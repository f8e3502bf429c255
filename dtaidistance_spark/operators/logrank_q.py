"""TS103 — log-rank test between two user cohorts' conversion
curves (Mantel'66; Peto–Peto'72; the Mantel–Haenszel form): the
INFERENCE half of the survival pair TS98 opened — KM draws each
cohort's censoring-correct conversion curve; the log-rank test
says whether two curves DIFFER, pooling a 2×2 hypergeometric table
at every event time:

    at event time t:  E₁(t) = d_t·n₁t/n_t,
    V(t) = d_t·(n₁t/n_t)·(n₂t/n_t)·(n_t−d_t)/(n_t−1),
    z = (O₁ − ΣE₁)/√ΣV,   χ² = z² ~ χ²(1),

with the same declared event machinery as TS98 (first purchase
with value > 100, whole-day durations, right-censored at the
window end) and cohorts = user_id parity (declared).  This is the
test a product experiment actually runs on conversion ("did the
treatment arm convert FASTER, accounting for the users who
haven't yet?") — a naive converted-fraction comparison throws
away time and censoring both.

Machinery: per-user reduction → per-duration (d₁, c₁, d₂, c₂)
counts → ONE state-replace array-accumulator fold over the sorted
distinct durations (the T87/KM posture: state = [n₁, n₂, O₁, E₁,
V], at-risk decremented AFTER each time's table — events and
censorings at equal t both leave, events first per the KM
convention); counts exact INT64, the E/V accumulation is the one
float chain whose order the fold itself pins; floor-1e6; verdict
χ² > 3.841458820694124; NULL-guarded at ΣV = 0.

Honest (gated) reading — measured: the parity cohorts are
exchangeable and the test says so at both scales — at sf0.01
O₁ = 60 vs E₁ = 60.205, z = −0.038, χ² = 0.0015 against the 3.84
line (sf0.001: z = −0.327): the difference between the two KM
curves is exactly at-risk noise, and a test this close to zero is
itself diagnostic — parity splits users before any behaviour, so
anything beyond noise here would mean an id-assignment artifact.
The discrimination lives in pytest: a planted slowed cohort
(durations 1.5×) rejects decisively, the two-sided symmetry
z(A,B) = −z(B,A) is exact, and the single-event hand table
matches the hypergeometric moments by hand.

Scale shape: two keyed aggregates + a driver-scale fold over ≤
|distinct durations| rows — the corpus crosses the wire once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_THR_CENTS = 10000

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_CHI1 = "3.841458820694124"

# state = [[n1, n2, o1, e1, v]]; input rows [[dur, d1, c1, d2, c2]]
_SPARK_STEP = (
    "array(array("
    # n1' = n1 − d1 − c1
    "element_at(element_at(acc, 1), 1) - element_at(x, 2)"
    " - element_at(x, 3),"
    # n2' = n2 − d2 − c2
    "element_at(element_at(acc, 1), 2) - element_at(x, 4)"
    " - element_at(x, 5),"
    # o1 += d1
    "element_at(element_at(acc, 1), 3) + element_at(x, 2),"
    # e1 += d·n1/n
    "element_at(element_at(acc, 1), 4)"
    " + (element_at(x, 2) + element_at(x, 4))"
    " * element_at(element_at(acc, 1), 1)"
    " / (element_at(element_at(acc, 1), 1)"
    "    + element_at(element_at(acc, 1), 2)),"
    # v += d·(n1/n)·(n2/n)·(n−d)/(n−1)  [0 when n = 1]
    "element_at(element_at(acc, 1), 5)"
    " + CASE WHEN element_at(element_at(acc, 1), 1)"
    "          + element_at(element_at(acc, 1), 2) > 1 THEN"
    " (element_at(x, 2) + element_at(x, 4))"
    " * element_at(element_at(acc, 1), 1)"
    " * element_at(element_at(acc, 1), 2)"
    " * (element_at(element_at(acc, 1), 1)"
    "    + element_at(element_at(acc, 1), 2)"
    "    - element_at(x, 2) - element_at(x, 4))"
    " / ((element_at(element_at(acc, 1), 1)"
    "     + element_at(element_at(acc, 1), 2))"
    "    * (element_at(element_at(acc, 1), 1)"
    "       + element_at(element_at(acc, 1), 2))"
    "    * (element_at(element_at(acc, 1), 1)"
    "       + element_at(element_at(acc, 1), 2) - 1))"
    " ELSE CAST(0 AS DOUBLE) END))"
)

_DUCK_STEP = (
    "[[acc[1][1] - x[1][2] - x[1][3],"
    " acc[1][2] - x[1][4] - x[1][5],"
    " acc[1][3] + x[1][2],"
    " acc[1][4] + (x[1][2] + x[1][4]) * acc[1][1]"
    " / (acc[1][1] + acc[1][2]),"
    " acc[1][5] + CASE WHEN acc[1][1] + acc[1][2] > 1 THEN"
    " (x[1][2] + x[1][4]) * acc[1][1] * acc[1][2]"
    " * (acc[1][1] + acc[1][2] - x[1][2] - x[1][4])"
    " / ((acc[1][1] + acc[1][2]) * (acc[1][1] + acc[1][2])"
    "    * (acc[1][1] + acc[1][2] - 1))"
    " ELSE CAST(0 AS DOUBLE) END]]"
)

_Z = "((o1 - e1) / sqrt(v))"
_OUT = [
    "CAST(nu1 AS BIGINT) AS n_users_even",
    "CAST(nu2 AS BIGINT) AS n_users_odd",
    "CAST(o1 AS BIGINT) AS observed_even",
    f"{_F6.format(x='e1')} AS expected_even",
    f"{_F6.format(x='v')} AS variance",
    f"CASE WHEN v > 0 THEN {_F6.format(x=_Z)}"
    " ELSE CAST(NULL AS DOUBLE) END AS z_logrank",
    f"CASE WHEN v > 0 THEN {_F6.format(x=f'({_Z} * {_Z})')}"
    " ELSE CAST(NULL AS DOUBLE) END AS chi2_logrank",
    f"CAST(CASE WHEN v <= 0 THEN NULL"
    f" WHEN {_Z} * {_Z} > {_CHI1} THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_same_curve",
]


@register(
    "logrank_cohorts",
    oracle=f"""
    WITH w AS (
      SELECT date_trunc('day', max(ts)) AS wend FROM events
    ),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
             date_trunc('day', min(ts)) AS d0,
             date_trunc('day', min(ts) FILTER (WHERE
               event_type = 'purchase'
               AND CAST(floor(100.0 * value + 0.5) AS BIGINT)
                   > {_THR_CENTS})) AS dp
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT grp,
             CAST(date_diff('day', d0,
                  COALESCE(dp, (SELECT wend FROM w))) AS BIGINT)
               AS dur,
             CASE WHEN dp IS NULL THEN 0 ELSE 1 END AS ev
      FROM u
    ),
    grouped AS (
      SELECT dur,
             CAST(SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 - ev ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END)
                  AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 - ev ELSE 0 END)
                  AS BIGINT) AS c2
      FROM durs GROUP BY dur
    ),
    packed AS (
      SELECT CAST(SUM(d1 + c1) AS BIGINT) AS nu1,
             CAST(SUM(d2 + c2) AS BIGINT) AS nu2,
             list_sort(list([[CAST(dur AS DOUBLE), CAST(d1 AS DOUBLE),
                              CAST(c1 AS DOUBLE), CAST(d2 AS DOUBLE),
                              CAST(c2 AS DOUBLE)]])) AS rows_
      FROM grouped
    ),
    folded AS (
      SELECT nu1, nu2,
             list_reduce(
               list_prepend(
                 [[CAST(nu1 AS DOUBLE), CAST(nu2 AS DOUBLE),
                   CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS DOUBLE)]],
                 rows_),
               (acc, x) -> {_DUCK_STEP}) AS st
      FROM packed
    ),
    fin AS (
      SELECT nu1, nu2, st[1][3] AS o1, st[1][4] AS e1, st[1][5] AS v
      FROM folded
    )
    SELECT {", ".join(_OUT)}
    FROM fin
    """,
)
def logrank_cohorts(spark, sf_dir):
    """TS103: Mantel–Haenszel log-rank between user-parity cohorts
    on time-to-first-high-value-purchase (module header) — keyed
    aggregates + one state-replace fold, exact int64 counts,
    fold-pinned E/V chain, floor-1e6."""
    ev = T(spark, sf_dir, "events")
    wend = ev.agg(F.date_trunc("day", F.max("ts")).alias("wend"))
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc(
            "day",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (
                        F.expr(
                            "CAST(floor(100.0 * value + 0.5) AS BIGINT)"
                        )
                        > _THR_CENTS
                    ),
                    F.col("ts"),
                )
            ),
        ).alias("dp"),
    )
    durs = u.crossJoin(F.broadcast(wend)).selectExpr(
        "CAST(user_id % 2 AS BIGINT) AS grp",
        "CAST(datediff(CAST(COALESCE(dp, wend) AS DATE),"
        " CAST(d0 AS DATE)) AS BIGINT) AS dur",
        "CASE WHEN dp IS NULL THEN 0 ELSE 1 END AS ev",
    )
    grouped = durs.groupBy("dur").agg(
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT)"
        ).alias("d1"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN 1 - ev ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c1"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)"
        ).alias("d2"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 1 THEN 1 - ev ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c2"),
    )
    packed = grouped.agg(
        F.expr("CAST(SUM(d1 + c1) AS BIGINT)").alias("nu1"),
        F.expr("CAST(SUM(d2 + c2) AS BIGINT)").alias("nu2"),
        F.expr(
            "array_sort(collect_list(array(CAST(dur AS DOUBLE),"
            " CAST(d1 AS DOUBLE), CAST(c1 AS DOUBLE),"
            " CAST(d2 AS DOUBLE), CAST(c2 AS DOUBLE))))"
        ).alias("rows_"),
    )
    folded = packed.selectExpr(
        "nu1",
        "nu2",
        f"""aggregate(rows_,
             array(array(CAST(nu1 AS DOUBLE), CAST(nu2 AS DOUBLE),
                         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                         CAST(0 AS DOUBLE))),
             (acc, x) -> {_SPARK_STEP}) AS st""",
    ).selectExpr(
        "nu1",
        "nu2",
        "element_at(element_at(st, 1), 3) AS o1",
        "element_at(element_at(st, 1), 4) AS e1",
        "element_at(element_at(st, 1), 5) AS v",
    )
    return folded.selectExpr(*_OUT)
