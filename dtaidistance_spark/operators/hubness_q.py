"""E7 — hubness diagnostic over the embedding space (Radovanović et
al. JMLR'10): the k-occurrence distribution N_k(x) = "how many points
count x among their k nearest neighbors".  In high dimension N_k
grows right-skewed — a few HUBS appear in everyone's neighbor lists
while antihubs appear in none — and that skew silently corrupts
kNN-based dedup/retrieval (SemDeDup, ANN eval): the standard health
check before trusting neighbor graphs.

One summary row: n, k, the exact identity Σ N_k = n·k (emitted and
gated — every query hands out exactly k votes), the SKEWNESS of N_k
via the TS62 cleared integer moment forms (N_k counts are int64, so
M2/M3 are exact; skew is one shared float tree, floor-1e6), max N_k,
hub count (N_k > 2k — the usual rule of thumb) and antihub count
(N_k = 0, via the left join back to all ids).

Pipeline: the exact brute top-k (ann.brute_cosine_topk with the WHOLE
set as queries — declared: at corpus scale hubness is estimated on a
sample, this is the verification tier) → one count aggregate per
nn_id → left join to all ids (coalesce 0 keeps antihubs) → one
moment aggregate.  Oracle: the same in DuckDB window SQL.

Honest (gated) reading: these embeddings are synthetic
near-isotropic vectors at d = 64 and n = 500, so the hubness skew is
MILD but strictly positive with a max N_k ≈ 2k and NO antihubs yet —
the d → ∞ pathology is only beginning, and the diagnostic reads that
real geometry rather than a planted answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import ann as A
from dtaidistance_spark.operators.queries import T, register

_K = 10

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# skew over int64 (n, s1, s2, s3) of the N_k counts — the TS62 cleared
# forms: M2 = n·s2 − s1², M3 = n²·s3 − 3n·s1·s2 + 2s1³ (counts are
# small: s3 ≤ n·(nk)³ is far inside int64 here, bound gated in pytest)
_M2 = "(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
_M3 = (
    "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)"
    " - 3.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)"
    " + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
)
_SKEW = f"({_M3} / ({_M2} * sqrt({_M2})))"


@register(
    "hubness_diagnostic",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
             list_inner_product(q.e, c.e)
               / (sqrt(list_inner_product(q.e, q.e))
                  * sqrt(list_inner_product(c.e, c.e))) AS cos
      FROM v q JOIN v c ON q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT query_id, nn_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, nn_id ASC) AS rank
      FROM scored
    ),
    occ AS (
      SELECT nn_id, CAST(count(*) AS BIGINT) AS nk
      FROM ranked WHERE rank <= {_K} GROUP BY nn_id
    ),
    full_occ AS (
      SELECT v.vec_id, COALESCE(o.nk, 0) AS nk
      FROM v LEFT JOIN occ o ON v.vec_id = o.nn_id
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nk) AS BIGINT) AS s1,
             CAST(sum(nk * nk) AS BIGINT) AS s2,
             CAST(sum(nk * nk * nk) AS BIGINT) AS s3,
             CAST(max(nk) AS BIGINT) AS max_nk,
             CAST(sum(CASE WHEN nk > {2 * _K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hubs,
             CAST(sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_antihubs
      FROM full_occ
    )
    SELECT n, CAST({_K} AS BIGINT) AS k, s1, s2, s3,
           max_nk, n_hubs, n_antihubs,
           {_F6.format(x=_SKEW)} AS nk_skew
    FROM mom
    """,
)
def hubness_diagnostic(spark, sf_dir):
    """E7: k-occurrence hubness summary (module header) — exact brute
    top-k votes counted per neighbor, antihubs restored by the left
    join, skewness from cleared int64 moments, floor-1e6."""
    emb = T(spark, sf_dir, "embeddings")
    topk = A.brute_cosine_topk(emb, emb, k=_K)
    occ = topk.groupBy("nn_id").agg(
        F.count(F.lit(1)).cast("long").alias("nk")
    )
    ids = emb.select(F.col("vec_id"))
    full = ids.join(
        occ, ids.vec_id == occ.nn_id, "left"
    ).select(F.coalesce("nk", F.lit(0)).cast("long").alias("nk"))
    mom = full.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nk").cast("long").alias("s1"),
        F.sum(F.col("nk") * F.col("nk")).cast("long").alias("s2"),
        F.sum(F.col("nk") * F.col("nk") * F.col("nk"))
        .cast("long")
        .alias("s3"),
        F.max("nk").cast("long").alias("max_nk"),
        F.sum(F.when(F.col("nk") > 2 * _K, 1).otherwise(0))
        .cast("long")
        .alias("n_hubs"),
        F.sum(F.when(F.col("nk") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_antihubs"),
    )
    return mom.select(
        "n",
        F.lit(_K).cast("long").alias("k"),
        "s1",
        "s2",
        "s3",
        "max_nk",
        "n_hubs",
        "n_antihubs",
        F.expr(_F6.format(x=_SKEW)).alias("nk_skew"),
    )
