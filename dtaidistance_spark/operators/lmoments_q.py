"""TS109 — L-moments and the L-moment ratio diagram per series
(Hosking JRSS-B'90; probability-weighted moments per Greenwood et
al. WRR'79): the robust alternative to TS14's ordinary moment
skew/kurtosis — L-moments are LINEAR in the order statistics, exist
whenever the mean exists (no 4th-moment blowup), and their ratio
pair (τ3, τ4) = (L-skew, L-kurt) is the classical distribution
fingerprint: uniform (0, 0), exponential (1/3, 1/6), Gumbel
(0.1699, 0.1504), with L-CV = λ2/λ1 = 1/3 for uniform-from-zero.

Exact sample form (ascending order statistics x_(1) ≤ … ≤ x_(n)):

    b_r·n·C(n−1,r) = N_r = Σ_i x_(i)·C(i−1, r)       (r = 0..3)
    λ1 = b0,  λ2 = 2b1−b0,  λ3 = 6b2−6b1+b0,
    λ4 = 20b3−30b2+12b1−b0;  L-CV = λ2/λ1, τ3 = λ3/λ2, τ4 = λ4/λ2.

Every N_r is an exact INT64 sum (binomials of row_number are exact
integer products/divisions; worst term C(2047,3)·V·n ≈ 1.5e17 under
the 2048-position cap — the cap IS the int64-exactness guard, and
order-statistic ties cannot perturb the sums), so the only floats
are the final λ/ratio trees, floor-1e6.

Honest (gated) reading — measured, and the draft's guess was HALF
wrong: the corpus medians nail the uniform fingerprint to
astonishing precision (median τ3 = 0.00002, τ4 = 0.00001, L-CV =
0.3334, λ1 = 25 134 ≈ V/2) — but the hoped-for "lattice
super-uniformity shrinks ALL the scatter" only holds for the ODD
ratio: sd(τ3) = 0.012 vs 0.020 for iid uniform at matched n's
(1.7× tighter — the Weyl-type equidistribution of
(hm·(j+1) + s_j) mod V kills sampling asymmetry faster than √n),
while sd(τ4) = 0.0116 is INDISTINGUISHABLE from the iid 0.0109 —
the sinusoid wiggle feeds exactly the even-order dispersion the
lattice would otherwise suppress.  Both halves gated.  The diagram
verdict stands: marginally uniform (the complementary read to
TS108's ξ, which sees the dependence this marginal hides), with
the odd/even scatter asymmetry as the engine's fingerprint of
deterministic structure.

Scale shape: explode → one hash exchange on doc (row_number sort
in-partition) → one map-side-combinable integer aggregate; the doc
set is fixed (_ND), independent of sf, so the int64 bound holds at
every scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128
_CAP = 2048

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# b_r = N_r / (n·C(n−1,r)) as float exprs over (n, n0..n3)
_B = {
    0: f"({_D('n0')} / {_D('n')})",
    1: f"({_D('n1')} / ({_D('n')} * {_D('(n - 1)')}))",
    2: f"({_D('n2')} / ({_D('n')} * {_D('((n - 1) * (n - 2) / 2)')}))",
    3: (
        f"({_D('n3')} / ({_D('n')}"
        f" * {_D('((n - 1) * (n - 2) * (n - 3) / 6)')}))"
    ),
}

_L1 = _B[0]
_L2 = f"(2 * {_B[1]} - {_B[0]})"
_L3 = f"(6 * {_B[2]} - 6 * {_B[1]} + {_B[0]})"
_L4 = f"(20 * {_B[3]} - 30 * {_B[2]} + 12 * {_B[1]} - {_B[0]})"


def _out() -> list[str]:
    guard = "n > 3"
    l2nz = f"abs({_L2}) > 1e-300"
    l1nz = f"abs({_L1}) > 1e-300"
    return [
        f"CASE WHEN {guard} THEN {_F6.format(x=_L1)}"
        " ELSE CAST(NULL AS DOUBLE) END AS l1",
        f"CASE WHEN {guard} THEN {_F6.format(x=_L2)}"
        " ELSE CAST(NULL AS DOUBLE) END AS l2",
        f"CASE WHEN {guard} AND {l1nz}"
        f" THEN {_F6.format(x=f'({_L2} / {_L1})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS lcv",
        f"CASE WHEN {guard} AND {l2nz}"
        f" THEN {_F6.format(x=f'({_L3} / {_L2})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS t3",
        f"CASE WHEN {guard} AND {l2nz}"
        f" THEN {_F6.format(x=f'({_L4} / {_L2})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS t4",
    ]


@register(
    "lmoment_ratios",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    long0 AS (
      SELECT doc_id, t.x,
             row_number() OVER (PARTITION BY doc_id ORDER BY t.x) AS i
      FROM docs, LATERAL unnest(v) AS t(x)
    ),
    agg AS (
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS n0,
        CAST(sum(x * (i - 1)) AS BIGINT) AS n1,
        CAST(sum(x * (((i - 1) * (i - 2)) // 2)) AS BIGINT) AS n2,
        CAST(sum(x * (((i - 1) * (i - 2) * (i - 3)) // 6)) AS BIGINT) AS n3
      FROM long0 GROUP BY doc_id
    )
    SELECT doc_id, n AS n_used, {", ".join(_out())}
    FROM agg
    """,
)
def lmoment_ratios(spark, sf_dir):
    """TS109: exact L-moments (λ1, λ2) + ratio diagram (L-CV, τ3,
    τ4) per synthetic doc (module header) — INT64 binomial-weighted
    order-statistic sums, one float tree per output, floor-1e6."""
    docs = synth.sequences_df(spark, _ND).select(
        "doc_id",
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}), x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    long0 = docs.select("doc_id", F.explode("v").alias("x")).select(
        "doc_id",
        "x",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("x"))
        .cast("long")
        .alias("i"),
    )
    agg = long0.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("n0"),
        F.sum(F.col("x") * (F.col("i") - 1)).cast("long").alias("n1"),
        F.sum(
            F.col("x") * ((F.col("i") - 1) * (F.col("i") - 2) / 2).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n2"),
        F.sum(
            F.col("x")
            * (
                (F.col("i") - 1) * (F.col("i") - 2) * (F.col("i") - 3) / 6
            ).cast("long")
        )
        .cast("long")
        .alias("n3"),
    )
    return agg.selectExpr("doc_id", "n AS n_used", *_out())
