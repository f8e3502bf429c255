"""TS74 — Page's L trend test over blocked hourly event-type counts
(Page JASA'63): the ORDERED-ALTERNATIVE member of the blocked-rank
family — TS73's Friedman asks "do the k treatments differ AT ALL in
rank across blocks"; Page asks the sharper one-sided question "do
they follow a PREDICTED ORDER", L = Σ_j j·R_j with j the declared
treatment order, rejecting for large L.  Ranks, blocks and tie
machinery are EXACTLY TS73's (doubled midranks r2 = 2·rank + eq − 1,
all int64; shared (hour, type) cells).

Declared predicted order: alphabetical event-type order — computed
IN-QUERY without any partition-less window by the self-join count
j = 1 + #{types strictly smaller} (k² = 25 rows).  With L2 = Σ j·R2_j
(= 2L exactly; midranks declared, untied variance used — the standard
conservative convention, tie mass emitted as an audit column):

    E[L2] = b·k·(k+1)²/2
    z = (6·L2 − 3·b·k·(k+1)²) / (k·(k+1)·√(b·(k−1)))

int64 numerator, ONE float tree (floor-1e6), one-sided verdict vs the
z₀.₉₅ = 1.6448536269514722 literal (Page rejects for large L only —
agreement with the predicted order).

Honest (gated) reading: hourly counts of the five types are
exchangeable, and alphabetical order predicts nothing, so Page
correctly fails to reject (z ≈ 0) — the ordered complement of TS73's
blocked null.

Scale shape: identical to TS73 — the corpus crosses the wire once as
the b×k = 120 cell counts; every window and join after runs over
driver-scale data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.friedman_q import _K
from dtaidistance_spark.operators.queries import T, register

_Z_95 = "1.6448536269514722"  # one-sided z_0.95, tabulated

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_NUM = "CAST(6 * l2 - 3 * b * k * (k + 1) * (k + 1) AS DOUBLE)"
_DEN = (
    "(CAST(k * (k + 1) AS DOUBLE)"
    " * sqrt(CAST(b * (k - 1) AS DOUBLE)))"
)
_Z = f"(({_NUM}) / ({_DEN}))"
_REJ = (
    f"CAST(CASE WHEN ({_Z}) > CAST('{_Z_95}' AS DOUBLE)"
    " THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "page_trend_test",
    oracle=f"""
    WITH cells AS (
      SELECT hour(ts) AS h, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT h, event_type, c,
             CAST(2 * rank() OVER (PARTITION BY h ORDER BY c)
                  + count(*) OVER (PARTITION BY h, c) - 1
                  AS BIGINT) AS r2,
             CAST(count(*) OVER (PARTITION BY h, c) AS BIGINT) AS eq
      FROM cells
    ),
    agg AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_sum
      FROM rk GROUP BY event_type
    ),
    ord AS (
      SELECT a.event_type,
             CAST(1 + count(b.event_type) AS BIGINT) AS j
      FROM agg a LEFT JOIN agg b ON b.event_type < a.event_type
      GROUP BY a.event_type
    ),
    tab AS (
      SELECT CAST(count(DISTINCT h) AS BIGINT) AS b,
             CAST({_K} AS BIGINT) AS k,
             CAST(sum(eq * eq - 1) AS BIGINT) AS tie_sum
      FROM rk
    ),
    l AS (
      SELECT CAST(sum(o.j * a.r2_sum) AS BIGINT) AS l2
      FROM agg a JOIN ord o ON a.event_type = o.event_type
    )
    SELECT a.event_type, o.j, a.r2_sum, t.b, t.k, t.tie_sum, l.l2,
           {_F6.format(x=_Z)} AS page_z,
           {_REJ} AS reject_predicted_order
    FROM agg a JOIN ord o ON a.event_type = o.event_type, tab t, l
    """,
)
def page_trend_test(spark, sf_dir):
    """TS74: Page's L ordered-alternative trend test over hourly
    event-type counts (module header) — TS73's doubled-midrank cells,
    alphabetical order via the self-join count (no partition-less
    window), int64 L2, one float tree, floor-1e6."""
    from pyspark.sql import Window

    cells = (
        T(spark, sf_dir, "events")
        .groupBy(F.hour("ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wb = Window.partitionBy("h").orderBy("c")
    we = Window.partitionBy("h", "c")
    rk = cells.select(
        "h",
        "event_type",
        "c",
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(we) - 1)
        .cast("long")
        .alias("r2"),
        F.count(F.lit(1)).over(we).cast("long").alias("eq"),
    )
    agg = rk.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("r2_sum")
    )
    ordj = (
        agg.alias("a")
        .join(
            F.broadcast(agg.alias("b")),
            F.col("b.event_type") < F.col("a.event_type"),
            "left",
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg((1 + F.count(F.col("b.event_type"))).cast("long").alias("j"))
    )
    tab = rk.agg(
        F.countDistinct("h").cast("long").alias("b"),
        F.lit(_K).cast("long").alias("k"),
        F.sum(F.col("eq") * F.col("eq") - 1).cast("long").alias("tie_sum"),
    )
    joined = agg.join(F.broadcast(ordj), "event_type")
    l2 = joined.agg(
        F.sum(F.col("j") * F.col("r2_sum")).cast("long").alias("l2")
    )
    return (
        joined.crossJoin(F.broadcast(tab))
        .crossJoin(F.broadcast(l2))
        .select(
            "event_type",
            "j",
            "r2_sum",
            "b",
            "k",
            "tie_sum",
            "l2",
            F.expr(_F6.format(x=_Z)).alias("page_z"),
            F.expr(_REJ).alias("reject_predicted_order"),
        )
    )
