"""E13b/TS124b — deterministic md5-SAMPLED scale tiers for the two
O(n²)-pair embedding two-sample diagnostics (MMD, energy distance):
the registry scale path the round-3 verdict asked for, mirroring the
T3 → PPJoin precedent — the exact 124,750-pair tiers
(``mmd_embedding_halves``, ``energy_distance_halves``) are hereby the
VERIFICATION twins and these sampled tiers are what runs at corpus
scale.

Sample rule (declared, retry-idempotent, zero RNG — the T20/T21
md5-bucket convention): keep a vector iff

    ('0x' || substr(md5('esub|' || vec_id), 1, 8))::BIGINT % 4 = 0

i.e. a deterministic ~1/4 thinning applied BEFORE the pair join, so
the pair stream shrinks quadratically (~16×: 124,750 → ~7,600 pairs
here) while both engines select the IDENTICAL subset.  At 100 TB the
modulus is the tuning knob: choose it so the kept sample is ~4k
vectors (≈8M pairs, one executor's worth of pinned folds) regardless
of corpus size — the statistic is a two-sample test, and its power at
m samples is the power you paid for; the corpus never self-joins.
Everything downstream (chord d² folds, exact low-median bandwidth,
unbiased U-form MMD², V-form energy E) reuses the exact tiers'
machinery verbatim, so the exactness argument is inherited: pinned
64-term folds, round(12), one shared double tree, floor-1e6.

Statistical contract (the pytest gate, not hand-waving): the sampled
MMD²_u / energy E are estimates of the SAME population functionals as
the exact tiers, so under the corpus's same-distribution split both
must land inside their own label-permutation null bands at the
SAMPLED size — wider bands than the full-n tiers (null sd scales
~1/m), which is the declared price of the 16× pair reduction.

Honest (gated) reading — measured at sf0.01 (m_a = 63, m_b = 63 of
n = 500 — the md5 rule keeps 126 = 25.2%, and BOTH parity classes
evenly; 7,875 unordered pairs, a 15.8× reduction): mmd2_u(sampled)
= -0.001239 with bandwidth 1.999323 (the isotropic chord-median ≈ 2
again, now read from 1/16 of the pairs — the small negative is the
U-form's signature null outcome at any m); energy_dist(sampled) =
0.042237 vs the exact tier's 0.011147 — NOT a discrepancy but the
V-statistic bias floor scaling like ~1/m (0.0112 × 500/126 ≈ 0.044
predicted, 0.042 measured; the permutation gate confirms the value
sits inside its own m=126 null band), the exact lesson the TS124
docstring warns about, re-measured live at the sampled size.

Scale shape: one codegen hash filter on the scan (no shuffle), the
m-row sample broadcast against itself, two aggregates — the corpus
appears once and never pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.energydist_q import _E
from dtaidistance_spark.operators.energydist_q import _SUMS as _ESUMS
from dtaidistance_spark.operators.mmd_q import _MMD, _OUT, _SUMS, _d2
from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_DD = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# deterministic 1/4 thinning — identical md5 semantics both engines
_KEEP_DUCK = (
    "(('0x' || substr(md5('esub|' || CAST(vec_id AS VARCHAR)), 1, 8))"
    "::BIGINT % 4 = 0)"
)
_KEEP_SPARK = (
    "(pmod(CAST(conv(substring(md5(concat('esub|',"
    " CAST(vec_id AS STRING))), 1, 8), 16, 10) AS BIGINT), 4) = 0)"
)


def _sampled_v(spark, sf_dir):
    return T(spark, sf_dir, "embeddings").where(_KEEP_SPARK).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.expr("CAST(vec_id % 2 AS BIGINT)").alias("g"),
    )


_V_DUCK = f"""
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(vec_id % 2 AS BIGINT) AS g
      FROM embeddings WHERE {_KEEP_DUCK}
"""


@register(
    "mmd_sampled",
    oracle=f"""
    WITH v AS ({_V_DUCK}),
    prs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.g AS ga, b.g AS gb,
             {_d2("duck")} AS d2
      FROM (SELECT vec_id, e AS ae, g FROM v) a(vec_id, ae, g),
           (SELECT vec_id, e AS be, g FROM v) b(vec_id, be, g)
    ),
    med AS (
      SELECT list_sort(list(d2))[(count(*) + 1) // 2] AS gam
      FROM prs WHERE ia < ib
    ),
    kv AS (
      SELECT ia, ib, ga, gb,
             round(exp(-d2 / (SELECT gam FROM med)), 12) AS kv
      FROM prs
    ),
    agg AS (
      SELECT (SELECT gam FROM med) AS gam,
             {", ".join(f"{x} AS {k}" for k, x in _SUMS.items())},
             SUM(CASE WHEN ga = 0 AND gb = 1 THEN 1 ELSE 0 END)
               AS n_ab
      FROM kv
    )
    SELECT {", ".join(_OUT)}
    FROM agg
    """,
)
def mmd_sampled(spark, sf_dir):
    """E13b: unbiased quadratic MMD² between vec_id-parity halves of
    the deterministic md5 quarter-sample (module header) — the E13
    machinery verbatim over ~1/16 of the pairs; the registry scale
    tier, with ``mmd_embedding_halves`` demoted to verification."""
    v = _sampled_v(spark, sf_dir)
    a = v.selectExpr("vec_id AS ia", "e AS ae", "g AS ga")
    b = v.selectExpr("vec_id AS ib", "e AS be", "g AS gb")
    prs = a.crossJoin(F.broadcast(b)).selectExpr(
        "ia", "ib", "ga", "gb", f"{_d2('spark')} AS d2"
    )
    med = prs.where("ia < ib").agg(
        F.expr(
            "element_at(array_sort(collect_list(d2)),"
            " CAST((count(d2) + 1) DIV 2 AS INT))"
        ).alias("gam")
    )
    kv = prs.crossJoin(F.broadcast(med)).selectExpr(
        "ia", "ib", "ga", "gb", "gam",
        "round(exp(-d2 / gam), 12) AS kv",
    )
    agg = kv.agg(
        F.first("gam").alias("gam"),
        *[F.expr(x).alias(k) for k, x in _SUMS.items()],
        F.expr(
            "SUM(CASE WHEN ga = 0 AND gb = 1 THEN 1 ELSE 0 END)"
        ).alias("n_ab"),
    )
    return agg.selectExpr(*_OUT)


@register(
    "energy_distance_sampled",
    oracle=f"""
    WITH v AS ({_V_DUCK}),
    prs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.g AS ga, b.g AS gb,
             round(sqrt(greatest({_d2("duck")}, 0.0)), 12) AS dv
      FROM (SELECT vec_id, e AS ae, g FROM v) a(vec_id, ae, g),
           (SELECT vec_id, e AS be, g FROM v) b(vec_id, be, g)
    ),
    agg AS (
      SELECT {", ".join(f"{x} AS {k}" for k, x in _ESUMS.items())}
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
def energy_distance_sampled(spark, sf_dir):
    """TS124b: V-form energy distance between vec_id-parity halves of
    the deterministic md5 quarter-sample (module header) — the TS124
    machinery verbatim over ~1/16 of the pairs; the registry scale
    tier, with ``energy_distance_halves`` demoted to verification."""
    v = _sampled_v(spark, sf_dir)
    a = v.selectExpr("vec_id AS ia", "e AS ae", "g AS ga")
    b = v.selectExpr("vec_id AS ib", "e AS be", "g AS gb")
    prs = a.crossJoin(F.broadcast(b)).selectExpr(
        "ia",
        "ib",
        "ga",
        "gb",
        f"round(sqrt(greatest({_d2('spark')}, 0.0)), 12) AS dv",
    )
    agg = prs.agg(*[F.expr(x).alias(k) for k, x in _ESUMS.items()])
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
