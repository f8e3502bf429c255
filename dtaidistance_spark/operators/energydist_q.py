"""TS124 — energy-distance two-sample test between embedding
halves (Székely–Rizzo InterStat'04; the E-statistic V-form): the
KERNEL-FREE sibling of E13's MMD — where MMD must choose a kernel
and bandwidth (the median heuristic is a choice, and a bad γ can
blind it), the energy statistic uses raw distances with NO tuning
parameter and is zero iff the distributions are equal (Székely's
characterization via the 1-homogeneous negative-definite kernel):

    E = 2·mean|X − Y| − mean|X − X'| − mean|Y − Y'|
    T = n_a·n_b/(n_a + n_b) · E        (the test statistic)

V-statistic convention declared (1/n² within-group means,
diagonal zeros included — the scipy/dcor default), split =
vec_id parity (the E13 split, so the two dials read the same
samples).  Distances are unit-sphere chord lengths √(2 − 2cos)
via the E13 order-pinned folds, round(12) before the conditional
sums; one shared double tree; floor-1e6.  No analytic null —
the permutation calibration is the pytest gate, the E13 honesty
convention.

Honest (gated) reading — measured: E = 0.011147, which lands at
the 45th PERCENTILE of its own label-permutation null (null mean
0.0112, band ≈ [0.009, 0.014]) — dead-center same-distribution —
and the number itself is the honesty lesson: the V-form's null
EXPECTATION is not zero but ≈ 0.0112 (the finite-sample bias the
V-statistic carries, where E13's U-form MMD read −0.000065 on the
SAME split), so a pipeline reading raw E > 0 as "different"
without the permutation band would false-alarm on every null
draw.  The pair of dials (kernel U-form at ≈ 0, kernel-free
V-form at its bias center) co-sign the verdict through disjoint
failure modes — the embedding analogue of the TS63/TS64
opposite-null design.  Gates:
planted mean shift and variance inflation both firing (T far
above the 95th permutation percentile); the rotation invariance
of E (orthogonal map of both samples leaves it exactly unchanged);
the E ≥ 0 V-statistic property; numpy recompute; the corpus
null-band + sign pins.

Scale shape: the E13 250k-pair VERIFICATION tier — one broadcast
self-join, one aggregate; the registry scale path is
``energy_distance_sampled`` (embedsample_q), the identical
machinery over the deterministic md5 quarter-sample.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.mmd_q import _d2
from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_DD = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_SUMS = {
    "daa": "SUM(CASE WHEN ga = 0 AND gb = 0"
    " THEN dv ELSE CAST(0 AS DOUBLE) END)",
    "dbb": "SUM(CASE WHEN ga = 1 AND gb = 1"
    " THEN dv ELSE CAST(0 AS DOUBLE) END)",
    "dab": "SUM(CASE WHEN ga = 0 AND gb = 1"
    " THEN dv ELSE CAST(0 AS DOUBLE) END)",
    "n_a": "SUM(CASE WHEN ga = 0 AND gb = 0 THEN 1 ELSE 0 END)",
    "n_b": "SUM(CASE WHEN ga = 1 AND gb = 1 THEN 1 ELSE 0 END)",
    "n_ab": "SUM(CASE WHEN ga = 0 AND gb = 1 THEN 1 ELSE 0 END)",
}

# V-statistic: within-group sums run over ALL ordered pairs incl.
# the zero diagonal, so the divisors are exactly n_a² = n_a-sum etc.
_E = (
    f"(2.0 * dab / {_DD('n_ab')}"
    f" - daa / {_DD('n_a')} - dbb / {_DD('n_b')})"
)
@register(
    "energy_distance_halves",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(vec_id % 2 AS BIGINT) AS g
      FROM embeddings
    ),
    prs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.g AS ga, b.g AS gb,
             round(sqrt(greatest({_d2("duck")}, 0.0)), 12) AS dv
      FROM (SELECT vec_id, e AS ae, g FROM v) a(vec_id, ae, g),
           (SELECT vec_id, e AS be, g FROM v) b(vec_id, be, g)
    ),
    agg AS (
      SELECT {", ".join(f"{x} AS {k}" for k, x in _SUMS.items())}
      FROM prs
    )
    SELECT CAST(n_a AS BIGINT) AS n_pairs_aa,
           CAST(n_b AS BIGINT) AS n_pairs_bb,
           CAST(n_ab AS BIGINT) AS n_pairs_ab,
           {_F6.format(x=_E)} AS energy_dist,
           {_F6.format(
               x=f"(sqrt({_DD('n_a')}) * sqrt({_DD('n_b')})"
               f" / (sqrt({_DD('n_a')}) + sqrt({_DD('n_b')}))"
               f" * {_E})")} AS t_stat
    FROM agg
    """,
)
def energy_distance_halves(spark, sf_dir):
    """TS124: two-sample energy distance between vec_id-parity
    halves (module header) — pinned chord-length folds, V-statistic
    convention, one shared double tree, floor-1e6."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.expr("CAST(vec_id % 2 AS BIGINT)").alias("g"),
    )
    a = v.selectExpr("vec_id AS ia", "e AS ae", "g AS ga")
    b = v.selectExpr("vec_id AS ib", "e AS be", "g AS gb")
    prs = a.crossJoin(F.broadcast(b)).selectExpr(
        "ia",
        "ib",
        "ga",
        "gb",
        f"round(sqrt(greatest({_d2('spark')}, 0.0)), 12) AS dv",
    )
    agg = prs.agg(
        *[F.expr(x).alias(k) for k, x in _SUMS.items()]
    )
    return agg.selectExpr(
        "CAST(n_a AS BIGINT) AS n_pairs_aa",
        "CAST(n_b AS BIGINT) AS n_pairs_bb",
        "CAST(n_ab AS BIGINT) AS n_pairs_ab",
        _F6.format(x=_E) + " AS energy_dist",
        _F6.format(
            x=f"(sqrt({_DD('n_a')}) * sqrt({_DD('n_b')})"
            f" / (sqrt({_DD('n_a')}) + sqrt({_DD('n_b')}))"
            f" * {_E})"
        )
        + " AS t_stat",
    )
