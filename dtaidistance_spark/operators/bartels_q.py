"""TS125 — Bartels rank von Neumann ratio per series (Bartels
JASA'82; von Neumann'41): the NONPARAMETRIC twin of TS66 — the
von Neumann ratio on RANKS instead of values, which keeps the
randomness verdict valid under any marginal distribution (heavy
tails, outliers, the mod-V wrap spikes that inflate a raw
successive-difference ratio):

    RVN = Σ_{t<n} (R_t − R_{t+1})² / Σ_t (R_t − R̄)²,
    E[RVN] = 2,   Var = 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²),
    z = (RVN − 2)/√Var   (Bartels' normal approximation)

Exactness: midranks DOUBLED (R2 = 2·rank() + tie − 1, the TS15
posture) so both sums are exact INT64 — the numerator's and
denominator's ×4 factors cancel in the ratio, and Σ(R2 − (n+1))²
uses the EXACT doubled mean n+1 (no division anywhere until the
final float tree); one partitioned window pass per doc (rank +
tie count + lag inside one exchange), floor-1e6, |z| > 1.96.

Honest (gated) reading — measured, and the rank domain SPLITS
what the value domain read as one verdict: 477 of 512 reject, but
TWO-SIDEDLY — 276 anti-persistent (z > 0, jumping ranks) against
201 PERSISTENT (z < 0, down to −44.4: successive observations
rank-ADJACENT) — where TS91's value-domain runs test read ~94%
one-way alternation.  The mechanism is the increment size: a
small-|hm| rotation moves each step only slightly along the ring,
so consecutive values are neighbors in RANK (persistence) even
while they alternate in micro-direction; a large-|hm| rotation
scatters ranks (anti-persistence).  Ranks see the step SIZE where
signs see only the step DIRECTION — the two tests are
complementary instruments, not substitutes, and the bifurcation
(median z = +3.5, range [−44.4, +22.7], RVN median 2.255) is the
corpus's increment-size distribution made visible.  Gates: the
exact n = 3 hand case (RVN of (1,3,2) = 2.5); planted iid null
≤ 12%; planted alternation (z > 10) and planted slow walk
(z < −10); the Bartels variance formula against an LCG
permutation-null sd (within 25%); numpy recompute per sampled
doc; the 477/512-reject two-sided-split corpus pins
(276 anti-persistent / 201 persistent, RVN median 2.255).

Scale shape: explode → ONE hash exchange on doc (rank/tie/lag
windows share it) → one map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_CAP = 2048

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_RVN = f"({_D('num4')} / {_D('den4')})"
_VAR = (
    f"(4.0 * ({_D('n')} - 2.0) * (5.0 * {_D('n')} * {_D('n')}"
    f" - 2.0 * {_D('n')} - 9.0)"
    f" / (5.0 * {_D('n')} * ({_D('n')} + 1.0)"
    f" * ({_D('n')} - 1.0) * ({_D('n')} - 1.0)))"
)
_Z = f"(({_RVN} - 2.0) / sqrt({_VAR}))"
_G = "n >= 10 AND den4 > 0"


def _out() -> list[str]:
    return [
        "CAST(n AS BIGINT) AS n",
        "CAST(num4 AS BIGINT) AS num4",
        "CAST(den4 AS BIGINT) AS den4",
        f"CASE WHEN {_G} THEN {_F6.format(x=_RVN)}"
        " ELSE CAST(NULL AS DOUBLE) END AS rvn",
        f"CASE WHEN {_G} THEN {_F6.format(x=_Z)}"
        " ELSE CAST(NULL AS DOUBLE) END AS z",
        f"CAST(CASE WHEN {_G} THEN CASE WHEN abs({_Z}) > 1.96"
        " THEN 1 ELSE 0 END ELSE NULL END AS BIGINT)"
        " AS reject_random",
    ]


@register(
    "bartels_rank_vn",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    long0 AS (
      SELECT doc_id, CAST(t.j AS BIGINT) AS j, v[t.j + 1] AS x
      FROM docs, LATERAL unnest(range(len(v))) AS t(j)
    ),
    ranked AS (
      SELECT doc_id, j,
        2 * rank() OVER (PARTITION BY doc_id ORDER BY x)
          + count(*) OVER (PARTITION BY doc_id, x) - 1 AS r2,
        count(*) OVER (PARTITION BY doc_id) AS n
      FROM long0
    ),
    lagged AS (
      SELECT doc_id, n, r2,
        lead(r2) OVER (PARTITION BY doc_id ORDER BY j) AS r2n
      FROM ranked
    ),
    agg AS (
      SELECT doc_id, any_value(n) AS n,
        CAST(sum(CASE WHEN r2n IS NULL THEN 0
                 ELSE (r2 - r2n) * (r2 - r2n) END) AS BIGINT) AS num4,
        CAST(sum((r2 - (n + 1)) * (r2 - (n + 1))) AS BIGINT)
          AS den4
      FROM lagged GROUP BY doc_id
    )
    SELECT doc_id, {", ".join(_out())}
    FROM agg
    """,
)
def bartels_rank_vn(spark, sf_dir):
    """TS125: Bartels rank von Neumann z per series (module header)
    — doubled midranks, exact INT64 sums with the exact doubled
    mean n+1, one float tree, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}), x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    long0 = docs.select(
        "doc_id", F.posexplode("v").alias("j", "x")
    ).select("doc_id", F.col("j").cast("long").alias("j"), "x")
    ranked = long0.select(
        "doc_id",
        "j",
        (
            2 * F.rank().over(
                Window.partitionBy("doc_id").orderBy("x")
            )
            + F.count("*").over(Window.partitionBy("doc_id", "x"))
            - 1
        ).alias("r2"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )
    lagged = ranked.select(
        "doc_id",
        "n",
        "r2",
        F.lead("r2")
        .over(Window.partitionBy("doc_id").orderBy("j"))
        .alias("r2n"),
    )
    agg = lagged.groupBy("doc_id").agg(
        F.expr("any_value(n)").alias("n"),
        F.sum(
            F.expr(
                "CASE WHEN r2n IS NULL THEN 0"
                " ELSE (r2 - r2n) * (r2 - r2n) END"
            )
        )
        .cast("long")
        .alias("num4"),
        F.sum(
            F.expr("(r2 - (n + 1)) * (r2 - (n + 1))")
        )
        .cast("long")
        .alias("den4"),
    )
    return agg.selectExpr("doc_id", *_out())
