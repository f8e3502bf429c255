"""E12 — Vendi diversity scores of the embedding set (Friedman–Dieng
TMLR'23; Rényi-order family per Pasarkar–Dieng AISTATS'24): THE
dataset-diversity number a curation pipeline reports — the
"effective number of distinct samples" VS_q = exp(Rényi-q entropy
of the cosine-kernel eigenvalues), reference-free and duplication-
sensitive where simple pairwise-mean-distance is not.  Closes the
embedding-audit family from the DIVERSITY side: E7 reads neighbor
pathology, E8 the spectrum shape, E11 the local degrees of freedom;
Vendi compresses the spectrum into the one number (how many
effectively-different things does this dataset contain?) that
SemDeDup-style thinning tries to maximize per token.

    K_ij = cos(x_i, x_j)  (unit-diagonal kernel),  λ̄ = eig(K/n):
    VS₁ = exp(−Σ λ̄ ln λ̄),  VS₂ = 1/Σ λ̄²,  VS_∞ = 1/λ̄_max.

Route: the nonzero λ̄ of K/n are exactly the eigenvalues of
M/n = Σ x̂x̂ᵀ/n (64×64) — so the n×n kernel is never materialized:
per-batch BLAS partials of the NORMALIZED outer-product sum,
zip_with-reduced to one 4096-double row (the E8 sufficient-stats
posture), one driver eigh of a 64×64 (declared, the _whitener
precedent), one output row.  Rows-only (an eigensolve is not ANSI
SQL) — but the q = 2 member has a kernel-free algebraic twin:
Σ λ̄² = ‖K‖_F²/n² = Σ_ij cos²(x_i,x_j)/n², a pure pair sum, and
`vendi_order2_check` computes VS₂ THAT way, fully DuckDB-oracled
(order-pinned dot folds, round(12) pair terms — the E10
convention); pytest proves the two routes agree, which certifies
the eigensolve against SQL.

Honest (gated) reading — measured: VS₁ = 59.98 of a POSSIBLE 64 —
and the ceiling is the point: Vendi diversity is capped by the
AMBIENT dimension (rank K ≤ d), so 500 near-isotropic vectors in
64-d read as ~60 effectively-distinct samples no matter how many
more you add — consistent with E11's "the cloud fills its ambient
space" and E8's flat spectrum, and a live demonstration that
REPORTED diversity of an embedded corpus is an embedding-DIMENSION
property as much as a data property.  VS₂ = 56.61, VS_∞ = 34.61
(the most-occupied eigendirection holds λ̄ = 0.0289 ≈ 1.8× the
isotropic 1/64 — higher orders punish that concentration harder),
order monotone VS₁ ≥ VS₂ ≥ VS_∞ (the Rényi hierarchy, gated).  The collapse
controls live in pytest: n copies of one vector read VS₁ = 1
exactly, k orthogonal clusters read VS₁ = k exactly, and a
duplicated 10% dents VS₁ by the predicted amount.

Scale shape: one mapInPandas scan with BLAS partials + a 64×64
driver eigh — linear in n, constant memory; the oracled twin's
n² pair sum is the declared verification tier.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_D = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _norm_suffstats(spark, sf_dir):
    """One row: [n, flat Σ x̂x̂ᵀ (4096)] over UNIT-normalized rows."""
    emb = T(spark, sf_dir, "embeddings").select("embedding")

    def batches(it):
        for b in it:
            X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"n": [float(len(X))], "stats": [(X.T @ X).ravel()]}
            )

    parts = emb.mapInPandas(batches, schema="n double, stats array<double>")
    return parts.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("stats"),
            F.expr(f"array_repeat(CAST(0 AS DOUBLE), {_D * _D})"),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("stats"),
    )


def vendi_from_stats(n, stats):
    """λ̄ of K/n via the 64×64 Gram; the three Vendi orders."""
    m = np.array(stats).reshape(_D, _D) / n
    lam = np.linalg.eigvalsh(m)
    lam = lam[lam > 1e-12]
    vs1 = math.exp(-(lam * np.log(lam)).sum())
    vs2 = 1.0 / (lam @ lam)
    vsi = 1.0 / lam.max()
    return lam, vs1, vs2, vsi


@register("vendi_scores")
def vendi_scores(spark, sf_dir):
    """E12: Vendi diversity orders 1/2/∞ of the embedding table
    (module header) — normalized-Gram sufficient stats, driver eigh,
    one summary row.  Rows-only; the q = 2 member is certified by
    the fully-oracled `vendi_order2_check` twin + pytest route
    equality."""
    row = _norm_suffstats(spark, sf_dir).collect()[0]
    n = int(row["n"])
    lam, vs1, vs2, vsi = vendi_from_stats(row["n"], row["stats"])
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    out = pd.DataFrame(
        {
            "n": [n],
            "d": [_D],
            "rank_eff": [int(len(lam))],
            "trace": [f6(float(lam.sum()))],
            "vs_1": [f6(vs1)],
            "vs_2": [f6(vs2)],
            "vs_inf": [f6(vsi)],
            "lam_max": [f6(float(lam.max()))],
        }
    )
    return spark.createDataFrame(out)


@register(
    "vendi_order2_check",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    prs AS (
      SELECT round(
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, {_D} + 1),
                   i -> CAST(a.e[i] * b.e[i] AS DOUBLE))),
                 (acc, q) -> acc + q)
               / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(1, {_D} + 1),
                      i -> CAST(a.e[i] * a.e[i] AS DOUBLE))),
                    (acc, q) -> acc + q))
                  * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(range(1, {_D} + 1),
                        i -> CAST(b.e[i] * b.e[i] AS DOUBLE))),
                      (acc, q) -> acc + q))), 12) AS c
      FROM v a JOIN v b ON true
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs, SUM(c * c) AS fro
      FROM prs
    )
    SELECT n_pairs,
           {_F6.format(x="fro")} AS frobenius_sum,
           {_F6.format(
               x="CAST(n_pairs AS DOUBLE) / fro")} AS vs_2
    FROM agg
    """,
)
def vendi_order2_check(spark, sf_dir):
    """E12 twin: VS₂ by the kernel-free Frobenius identity
    Σλ̄² = Σ_ij cos²/n² — an all-pairs sum with order-pinned dot
    folds and round(12) terms (E10 convention), no eigensolve
    anywhere.  The declared n² verification tier certifying
    `vendi_scores`' q = 2 number."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    fold = (
        "aggregate(sequence(1, 64), CAST(0 AS DOUBLE),"
        " (acc, i) -> acc + ({term}))"
    )
    dot = fold.format(
        term="element_at(ae, CAST(i AS INT)) * element_at(be, CAST(i AS INT))"
    )
    na = fold.format(
        term="element_at(ae, CAST(i AS INT)) * element_at(ae, CAST(i AS INT))"
    )
    nb = fold.format(
        term="element_at(be, CAST(i AS INT)) * element_at(be, CAST(i AS INT))"
    )
    prs = (
        v.select(F.col("e").alias("ae"))
        .crossJoin(F.broadcast(v.select(F.col("e").alias("be"))))
        .selectExpr(f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 12) AS c")
    )
    agg = prs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("c") * F.col("c")).alias("fro"),
    )
    return agg.selectExpr(
        "n_pairs",
        _F6.format(x="fro") + " AS frobenius_sum",
        _F6.format(x="CAST(n_pairs AS DOUBLE) / fro") + " AS vs_2",
    )
