"""E8 — PCA spectrum of the embedding space (Pearson 1901 /
Hotelling'33; the Eckart-Young low-rank backbone): the dimensionality
audit next to E7's hubness — before trusting cosine dedup / ANN
recall / SemDeDup budgets, a pipeline asks "how many directions does
this space actually use?"  Two entries in the established
rows-only + oracled-twin pairing (the E6 Procrustes convention):

``pca_cov_cells`` (ORACLED): the sufficient statistic itself as a
relational aggregate — upper-triangle cells (i ≤ j) of the raw
scatter Σ aᵢaⱼ plus the marginal sums and n, round(6): everything
PCA needs, hash-checked against DuckDB cell by cell (2 080 rows).
Per-row HOF pair expansion → ONE map-side-combined (i, j) aggregate.

``pca_embeddings`` (rows-only): the spectrum.  Per-Arrow-batch numpy
partial scatters (real BLAS — the scale path; one 4 096-double row
per batch crosses the wire), driver reduce + 64×64 ``eigh`` of the
covariance C = S/n − μμᵀ, then a DISTRIBUTED verification pass: the
top-8 eigenvectors broadcast back and the per-component projection
variance is recomputed against the data — each emitted row carries
BOTH λ_k and the measured proj_var so the eigenpair claim is proven
on the cluster, not just inside numpy (sign-invariant, so the
eigenvector sign ambiguity never reaches the schema).  Rows: rank,
eigenvalue, explained-variance ratio, cumulative EVR, proj_var,
trace (f6).

Honest (gated) reading: these embeddings are near-isotropic (E7's
hubness already said so) — the spectrum is FLAT: top EVR ≈ 2%,
barely above the 1/64 ≈ 1.56% isotropic floor, and it takes ~half
the dimensions to reach 50% variance.  PCA finds NO low-rank
structure to exploit, and the audit says so rather than
manufacturing one; the planted low-rank positive control (numpy:
rank-3 data ⇒ 3 eigenvalues carry everything) lives in pytest.

Scale shape: one scan for the partials (sufficient statistics only
— 4 161 doubles per batch), one broadcast + one scan for the
verification pass; nothing scales with n² anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_D = 64
_TOPK = 8

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@register(
    "pca_cov_cells",
    oracle=f"""
    WITH cells AS (
      SELECT unnest(flatten(list_transform(range(1, {_D} + 1),
               i -> list_transform(range(i, {_D} + 1),
               j -> {{'i': i, 'j': j,
                      'v': CAST(embedding[i] AS DOUBLE)
                           * CAST(embedding[j] AS DOUBLE),
                      'si': CASE WHEN j = i
                            THEN CAST(embedding[i] AS DOUBLE)
                            ELSE CAST(0 AS DOUBLE) END}})))) AS c
      FROM embeddings
    )
    SELECT c.i AS i, c.j AS j,
           round(sum(c.v), 6) AS s_ij,
           round(sum(c.si), 6) AS s_i_diag,
           CAST(count(*) AS BIGINT) AS n
    FROM cells GROUP BY c.i, c.j
    """,
)
def pca_cov_cells(spark, sf_dir):
    """E8a: the PCA sufficient statistic as a relational aggregate
    (module header) — upper-triangle scatter cells + marginal sums
    (carried on the diagonal rows), one (i, j) aggregate, round(6)."""
    emb = T(spark, sf_dir, "embeddings")
    cells = emb.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {_D}), i ->"
                f" transform(sequence(i, {_D}), j ->"
                f" named_struct('i', i, 'j', j,"
                f" 'v', CAST(element_at(embedding, i) AS DOUBLE)"
                f" * CAST(element_at(embedding, j) AS DOUBLE),"
                f" 'si', CASE WHEN j = i"
                f" THEN CAST(element_at(embedding, i) AS DOUBLE)"
                f" ELSE CAST(0 AS DOUBLE) END))))"
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.v", "c.si")
    return cells.groupBy("i", "j").agg(
        F.round(F.sum("v"), 6).alias("s_ij"),
        F.round(F.sum("si"), 6).alias("s_i_diag"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register("pca_embeddings")
def pca_embeddings(spark, sf_dir):
    """E8b: the PCA spectrum with a distributed eigenpair proof
    (module header) — batched BLAS partial scatters, driver eigh,
    broadcast top-8 eigenvectors, per-component projection variance
    recomputed against the data."""
    emb = T(spark, sf_dir, "embeddings").select("embedding")

    def scatter(batches):
        for pdf in batches:
            a = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(a)],
                    "s": [a.sum(axis=0).tolist()],
                    "ss": [(a.T @ a).reshape(-1).tolist()],
                }
            )

    parts = emb.mapInPandas(
        scatter, schema="n long, s array<double>, ss array<double>"
    ).collect()
    n = int(sum(r["n"] for r in parts))
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in parts], axis=0).reshape(
        _D, _D
    )
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    evals = evals[::-1]
    evecs = evecs[:, ::-1]
    trace = float(np.trace(cov))
    vb = spark.sparkContext.broadcast(
        (evecs[:, :_TOPK].copy(), mu.copy())
    )

    def projvar(batches):
        for pdf in batches:
            a = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            v, m = vb.value
            p = (a - m) @ v  # (batch, topk)
            yield pd.DataFrame(
                {
                    "n": [len(a)],
                    "sp": [p.sum(axis=0).tolist()],
                    "sp2": [(p * p).sum(axis=0).tolist()],
                }
            )

    vparts = emb.mapInPandas(
        projvar, schema="n long, sp array<double>, sp2 array<double>"
    ).collect()
    nv = int(sum(r["n"] for r in vparts))
    sp = np.sum([np.asarray(r["sp"]) for r in vparts], axis=0)
    sp2 = np.sum([np.asarray(r["sp2"]) for r in vparts], axis=0)
    pvar = sp2 / nv - (sp / nv) ** 2

    cum = 0.0
    rows = []
    for k in range(_TOPK):
        evr = float(evals[k]) / trace
        cum += evr
        rows.append(
            (
                k + 1,
                f6(float(evals[k])),
                f6(evr),
                f6(cum),
                f6(float(pvar[k])),
                f6(trace),
                n,
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "rank long, eigenvalue double, evr double, cum_evr double,"
            " proj_var double, trace double, n long"
        ),
    )
