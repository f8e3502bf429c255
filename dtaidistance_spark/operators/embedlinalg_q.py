"""Distributed linear algebra over the embeddings table, round-3
batch: the second-moment (gram) matrix as a relational aggregate
(DuckDB-oracled), and PCA's top principal component by power iteration
over a single-pass BLAS sufficient-statistics reduce — the two halves
of "covariance → eigenvector → projection" that an embedding-curation
pipeline (whitening, SemDeDup-style axis removal, outlier energy)
needs from the engine.

E5a — gram: S_ij = Σ_rows e_i·e_j for the upper triangle plus the
first-moment rows (j = −1 ⇒ Σ e_i), via per-row HOF pair expansion →
ONE map-side-combined (i, j) aggregate.  2 080 pair terms per row at
d = 64; the shuffle carries 2 081·P combiner rows, never the corpus.
round(6) on sums of ~N terms (noise ~1e-13 relative — the established
float-sum precedent).

E5b — PCA: sufficient statistics [n | Σe (64) | Σee^T (4096)] computed
per Arrow batch in numpy (real BLAS syrk under the hood — the scale
path), element-wise summed into ONE 4161-double row, eigenvector by 300
deterministic power iterations on the driver's 64×64 copy (fixed start
e_1, sign pinned by the largest-|coordinate| rule), then every
embedding projected onto the broadcast component with a pinned-order
fold.  Rows-only in the driver artifact (an eigensolve is not ANSI
SQL); its sufficient statistics are exactly the ORACLED E5a values
(gated bit-for-bit against the same round(6) grid in pytest), and the
component/scores are gated against numpy's full eigh.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_D = 64

# ---------------------------------------------------------------------------
# E5a — second-moment / gram matrix as a relational aggregate (oracled)
# ---------------------------------------------------------------------------


@register(
    "embed_gram_check",
    oracle=f"""
    WITH pairs AS (
      SELECT t.i AS i, u.j AS j,
             embedding[t.i + 1]::DOUBLE * embedding[u.j + 1]::DOUBLE AS v
      FROM embeddings,
           unnest(range({_D})) AS t(i),
           unnest(range({_D})) AS u(j)
      WHERE u.j >= t.i
    ),
    moments AS (
      SELECT i, -1 AS j, sum(v) AS s, count(*) AS n FROM (
        SELECT t.i AS i, embedding[t.i + 1]::DOUBLE AS v
        FROM embeddings, unnest(range({_D})) AS t(i)
      ) GROUP BY i
    )
    SELECT i, j, round(s, 6) AS s, n FROM (
      SELECT i, j, sum(v) AS s, count(*) AS n FROM pairs GROUP BY i, j
      UNION ALL
      SELECT * FROM moments
    )
    """,
)
def embed_gram_check(spark, sf_dir):
    """E5a: the embeddings' second-moment matrix Σ e_i·e_j (upper
    triangle, 2 080 entries at d = 64) plus first moments Σ e_i as
    j = −1 rows — the sufficient statistics for covariance/PCA — as a
    pure relational aggregate: per-row HOF pair expansion, explode,
    ONE map-side-combined (i, j) groupBy.  The combiners reduce
    everything to 2 144 rows per task regardless of corpus size;
    round(6) under the float-sum precedent.  This is the DuckDB-checked
    twin of ``pca_power_topcomp``'s BLAS reduce."""
    emb = T(spark, sf_dir, "embeddings").select("embedding")
    pairs = emb.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, {_D} - 1), i ->
                  transform(sequence(i, {_D} - 1), j -> struct(
                    i AS i, j AS j,
                    CAST(element_at(embedding, i + 1) AS DOUBLE)
                      * CAST(element_at(embedding, j + 1) AS DOUBLE) AS v))))"""
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.v")
    gram = pairs.groupBy("i", "j").agg(
        F.round(F.sum("v"), 6).alias("s"), F.count(F.lit(1)).alias("n")
    )
    firsts = (
        emb.select(
            F.posexplode(
                F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            ).alias("i", "v")
        )
        .groupBy("i")
        .agg(F.round(F.sum("v"), 6).alias("s"), F.count(F.lit(1)).alias("n"))
        .select("i", F.lit(-1).alias("j"), "s", "n")
    )
    return gram.unionByName(firsts)


# ---------------------------------------------------------------------------
# E5b — top principal component by power iteration (BLAS reduce)
# ---------------------------------------------------------------------------


def _suffstats_df(spark, sf_dir):
    """One row: [n, Σe (64), flat Σee^T (4096)] — per-batch numpy/BLAS
    partials, element-wise array-summed in a single reduce."""
    emb = T(spark, sf_dir, "embeddings").select("embedding")

    def gram_batches(batches):
        for b in batches:
            X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "stats": [
                        np.concatenate([X.sum(0), (X.T @ X).ravel()])
                    ],
                }
            )

    parts = emb.mapInPandas(
        gram_batches, schema="n double, stats array<double>"
    )
    return parts.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("stats"),
            F.expr(f"array_repeat(CAST(0 AS DOUBLE), {_D} + {_D * _D})"),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("stats"),
    )


def _power_component(n, stats):
    """Deterministic power iteration on the 64x64 covariance."""
    s1 = np.array(stats[:_D])
    s2 = np.array(stats[_D:]).reshape(_D, _D)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    v = np.zeros(_D)
    v[0] = 1.0
    for _ in range(300):
        v = cov @ v
        v /= np.linalg.norm(v)
    if v[np.argmax(np.abs(v))] < 0:  # pin the sign
        v = -v
    lam = float(v @ cov @ v)
    return mean, cov, v, lam


@register("pca_power_topcomp")
def pca_power_topcomp(spark, sf_dir):
    """E5b: top principal component of the embedding cloud by power
    iteration, end to end in one pass + one 64×64 driver solve: the
    [n | Σe | Σee^T] sufficient statistics reduce via Arrow-batched
    numpy (X.T @ X is a BLAS syrk per batch — the 100 TB shape: each
    task ships 4 161 doubles, the driver never sees a row), 300 fixed
    iterations from e_1 (the synthetic cloud is near-isotropic —
    eigengap ratio ≈ 0.93 — so convergence needs the extra rounds;
    still microseconds on a 64×64) with the sign pinned positive at the
    largest-|coordinate|, then every embedding scored by a pinned-order
    fold against the broadcast component.  Emits per-vector projection
    score, residual energy, and the component's explained-variance
    share.  Rows-only (eigensolve ≠ ANSI SQL); the statistics feeding
    it are the ORACLED ``embed_gram_check`` values and the component
    is gated against numpy eigh in pytest."""
    row = _suffstats_df(spark, sf_dir).first()
    mean, cov, v, lam = _power_component(row["n"], row["stats"])
    tot_var = float(np.trace(cov))
    v_lit = "array({})".format(
        ",".join(f"CAST({x!r} AS DOUBLE)" for x in v)
    )
    m_lit = "array({})".format(
        ",".join(f"CAST({x!r} AS DOUBLE)" for x in mean)
    )
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centered = F.expr(
        f"zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), {m_lit},"
        " (x, m) -> x - m)"
    )
    score = F.expr(
        f"aggregate(zip_with(cen, {v_lit}, (x, w) -> x * w),"
        " CAST(0 AS DOUBLE), (s, t) -> s + t)"
    )
    norm2 = F.expr(
        "aggregate(transform(cen, x -> x * x), CAST(0 AS DOUBLE),"
        " (s, t) -> s + t)"
    )
    return (
        emb.withColumn("cen", centered)
        .select(
            "vec_id",
            "label",
            F.round(score, 6).alias("pc1_score"),
            F.round(norm2 - score * score, 6).alias("residual_energy"),
            F.round(F.lit(lam / tot_var), 6).alias("explained_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# E6 — ZCA whitening + Mahalanobis outlier scoring
# ---------------------------------------------------------------------------

_EPS = 1e-9


def _whitener(n, stats):
    """ZCA whitening matrix W = V diag(1/sqrt(lam+eps)) V^T from the
    full symmetric eigendecomposition of the 64x64 covariance (driver-
    side, microseconds); Mahalanobis^2(x) = ||W (x - mean)||^2."""
    s1 = np.array(stats[:_D])
    s2 = np.array(stats[_D:]).reshape(_D, _D)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    lam, V = np.linalg.eigh(cov)
    W = (V * (1.0 / np.sqrt(lam + _EPS))) @ V.T
    return mean, cov, W


@register("embed_mahalanobis")
def embed_mahalanobis(spark, sf_dir):
    """E6: Mahalanobis outlier scoring of the embedding cloud — the
    covariance-aware distance an embedding-curation pipeline uses
    where plain L2 is blind to correlated axes.  Same architecture as
    E5b: the [n | Σe | Σee^T] sufficient statistics (the ORACLED
    ``embed_gram_check`` values) reduce in one Arrow/BLAS pass, the
    driver eigensolves the 64×64 covariance once and broadcasts the
    ZCA whitener W = V·diag(1/√(λ+ε))·Vᵀ, and every vector's
    maha² = ||W(x−μ)||² is a numpy matmul per Arrow batch — the
    100 TB shape: 4 KB of model crosses the wire, never a row.
    Rows-only (eigensolve ≠ ANSI SQL); numpy-gated in pytest, and the
    whitening claim itself is verified in-engine by
    ``embed_whiten_identity_check``."""
    row = _suffstats_df(spark, sf_dir).first()
    mean, cov, W = _whitener(row["n"], row["stats"])
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    bmean = spark.sparkContext.broadcast(mean)
    bW = spark.sparkContext.broadcast(W)

    def score(batches):
        for b in batches:
            X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            Z = (X - bmean.value) @ bW.value.T
            m2 = (Z * Z).sum(1)
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"],
                    "label": b["label"],
                    "maha2": np.round(m2, 6),
                }
            )

    out = emb.mapInPandas(
        score, schema="vec_id long, label int, maha2 double"
    )
    # chi²(64) has mean 64: flag > 64 + 4·sqrt(2·64) ≈ 109.3
    return out.withColumn(
        "is_outlier", F.col("maha2") > F.lit(64.0 + 4.0 * (2.0 * 64.0) ** 0.5)
    )


@register("embed_whiten_identity_check")
def embed_whiten_identity_check(spark, sf_dir):
    """E6-check: the whitening CONTRACT verified in-engine — running
    the SAME distributed BLAS sufficient-statistics reduce over the
    whitened vectors must give a covariance equal to the identity
    (up to the ε regularizer).  One summary row: max |diag − 1|,
    max |off-diag|, and n — if the whitener were wrong (bad eigh, bad
    broadcast, wrong mean), these deviations would be O(1), not 1e-9.
    Rows-only by nature; the INPUT statistics are the oracled
    ``embed_gram_check`` values."""
    row = _suffstats_df(spark, sf_dir).first()
    mean, cov, W = _whitener(row["n"], row["stats"])
    emb = T(spark, sf_dir, "embeddings").select("embedding")
    bmean = spark.sparkContext.broadcast(mean)
    bW = spark.sparkContext.broadcast(W)

    def white_stats(batches):
        for b in batches:
            X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            Z = (X - bmean.value) @ bW.value.T
            yield pd.DataFrame(
                {
                    "n": [float(len(Z))],
                    "stats": [
                        np.concatenate([Z.sum(0), (Z.T @ Z).ravel()])
                    ],
                }
            )

    parts = emb.mapInPandas(
        white_stats, schema="n double, stats array<double>"
    )
    tot = parts.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("stats"),
            F.expr(f"array_repeat(CAST(0 AS DOUBLE), {_D} + {_D * _D})"),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("stats"),
    ).first()
    n = tot["n"]
    s1 = np.array(tot["stats"][:_D])
    s2 = np.array(tot["stats"][_D:]).reshape(_D, _D)
    zmean = s1 / n
    zcov = s2 / n - np.outer(zmean, zmean)
    dev = zcov - np.eye(_D)
    off = dev - np.diag(np.diag(dev))
    return spark.createDataFrame(
        [(
            int(n),
            float(np.abs(np.diag(dev)).max()),
            float(np.abs(off).max()),
            float(np.abs(zmean).max()),
        )],
        "n long, max_diag_dev double, max_offdiag_dev double,"
        " max_mean_dev double",
    )


# ---------------------------------------------------------------------------
# E8 — Johnson-Lindenstrauss random projection (Achlioptas 2003 sparse
# ±1 scheme) + pairwise-distortion audit: d = 64 → d' = 16 with
# R[i][j] ∈ {+1, −1, 0} · sqrt(3/d') drawn from portable md5 bits —
# the projection is PURE relational algebra (explode × broadcast grid
# join × two reduces), so the oracle re-derives everything.
# ---------------------------------------------------------------------------

_JD = 16  # target dimension
_JNS = 64  # audit sample: vec_id < _JNS → 2016 pairs
_JL_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
# Achlioptas scale factor sqrt(3/d') applied to SQUARED distances: 3/d'
_JL_S2 = f"(CAST(3 AS DOUBLE) / CAST({_JD} AS DOUBLE))"
_JL_R = (
    "(CASE WHEN ('0x' || substr(md5('jl|' || CAST(i AS {st}) || '|' ||"
    " CAST(j AS {st})), 1, 8)){castb} % 6 = 0 THEN 1"
    " WHEN ('0x' || substr(md5('jl|' || CAST(i AS {st}) || '|' ||"
    " CAST(j AS {st})), 1, 8)){castb} % 6 = 1 THEN -1 ELSE 0 END)"
)


@register(
    "jl_project_distortion",
    oracle=f"""
    WITH grid AS (
      SELECT t.i AS i, u.j AS j,
             {_JL_R.format(st="VARCHAR", castb="::BIGINT")} AS r
      FROM unnest(range({_D})) AS t(i), unnest(range({_JD})) AS u(j)
    ),
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE vec_id < {_JNS}
    ),
    vals AS (
      SELECT vec_id, t.i AS i, e[t.i + 1] AS x
      FROM v, unnest(range({_D})) AS t(i)
    ),
    proj AS (
      SELECT vec_id, j, sum(x * CAST(r AS DOUBLE)) AS y
      FROM vals JOIN grid USING (i) WHERE r <> 0
      GROUP BY vec_id, j
    ),
    pd AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum((a.y - b.y) * (a.y - b.y)) * {_JL_S2} AS d2p
      FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    od AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum((a.x - b.x) * (a.x - b.x)) AS d2o
      FROM vals a JOIN vals b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT id_a, id_b,
           round(d2o, 6) AS d2_orig,
           round(d2p, 6) AS d2_proj,
           {_JL_F6.format(x="(d2p / d2o)")} AS ratio,
           (d2p / d2o >= CAST(0.35 AS DOUBLE)
            AND d2p / d2o <= CAST(1.8 AS DOUBLE)) AS within_jl_band
    FROM pd JOIN od USING (id_a, id_b)
    """,
)
def jl_project_distortion(spark, sf_dir):
    """E8: JL random projection d=64 → d'=16 with the Achlioptas
    sparse ±1 matrix drawn from md5 bits (zero RNG, re-derivable by the
    oracle), audited on all 2 016 pairs of a 64-vector sample: squared
    distances before/after, their ratio (E[ratio]=1 under JL), and the
    per-pair distortion-band flag. Plan: the 1 024-entry ±1 grid is
    GENERATED relationally and broadcast; projection = explode ×
    broadcast join × ONE (vec, j) reduce — at corpus scale each vector
    ships d' sums across one exchange and the grid never grows.
    Cross-row float sums under the round-6 precedent."""
    h = (
        "CAST(conv(substring(md5(concat('jl|', CAST(i AS STRING), '|', "
        "CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT) % 6"
    )
    grid = (
        spark.range(_D)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(spark.range(_JD).select(F.col("id").cast("int").alias("j")))
        .select(
            "i",
            "j",
            F.expr(
                f"CASE WHEN {h} = 0 THEN 1 WHEN {h} = 1 THEN -1 ELSE 0 END"
            ).alias("r"),
        )
    )
    v = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < _JNS)
    vals = v.select(
        "vec_id",
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("i", "x"),
    )
    proj = (
        vals.join(F.broadcast(grid.where(F.col("r") != 0)), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.expr("x * CAST(r AS DOUBLE)")).alias("y"))
    )
    pa = proj.select(F.col("vec_id").alias("id_a"), "j", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("id_b"), "j", F.col("y").alias("yb"))
    pd_ = (
        pa.join(pb, "j")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            (
                F.sum(F.expr("(ya - yb) * (ya - yb)")) * F.expr(_JL_S2)
            ).alias("d2p")
        )
    )
    va = vals.select(F.col("vec_id").alias("id_a"), "i", F.col("x").alias("xa"))
    vb = vals.select(F.col("vec_id").alias("id_b"), "i", F.col("x").alias("xb"))
    od = (
        va.join(vb, "i")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.expr("(xa - xb) * (xa - xb)")).alias("d2o"))
    )
    return pd_.join(od, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        F.round("d2o", 6).alias("d2_orig"),
        F.round("d2p", 6).alias("d2_proj"),
        F.expr(_JL_F6.format(x="(d2p / d2o)")).alias("ratio"),
        (
            (F.col("d2p") / F.col("d2o") >= F.expr("CAST(0.35 AS DOUBLE)"))
            & (F.col("d2p") / F.col("d2o") <= F.expr("CAST(1.8 AS DOUBLE)"))
        ).alias("within_jl_band"),
    )
