"""E10 — alignment & uniformity of the embedding space (Wang & Isola
ICML'20): THE two-number health check for contrastive/retrieval
embeddings — alignment = E‖x − y‖² over POSITIVE (same-label) pairs
(smaller = positives cluster), uniformity = ln E[exp(−2‖x − y‖²)]
over random pairs (more negative = mass spread over the sphere).
Completes the embedding-audit family: E7 hubness reads neighbor-list
pathology, E8 the spectrum, E9 projected distortion; E10 reads
whether the LABELS correspond to the geometry at all.

Premise gated: the vectors are unit-normalized (‖v‖ ∈ 1 ± 1e-7
measured), which is what the uniformity functional assumes.

``embed_alignment`` (per label): positive pairs are consecutive
vec_ids WITHIN a label — a lag window PARTITIONED by label (no
partition-less WindowExec), d² by an indexed fold, one aggregate per
label.  ``embed_uniformity`` (one row): the random-pair sample is
the declared consecutive-vec pairing (mostly cross-label), mean
exp(−2d²) then one ln, order irrelevant (a mean over f6-stable
doubles is still summed in engine order, so the exp terms are first
floored at 1e-9 scale — instead the sum is made order-free by
aggregating the EXACT pair terms with round(12) before sum; declared
and gated to 1e-6 agreement).

Honest (gated) reading: T69's silhouette already said these planted
labels are geometric noise (mean s ≈ 0), and E10 agrees from the
other side — same-label alignment ≈ 2.0, exactly the random-pair
mean d² (for unit vectors E‖x−y‖² = 2 − 2E cosθ ≈ 2 when directions
are independent), and uniformity sits near the isotropic reference
≈ −3.9: the space is healthy-uniform, the labels carry no geometry,
and BOTH dials say so consistently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_D = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _d2(eng: str, a: str, b: str) -> str:
    sp = eng == "spark"
    el = (
        (lambda c, i: f"element_at({c}, CAST({i} AS INT))")
        if sp
        else (lambda c, i: f"{c}[{i}]")
    )
    term = (
        f"(CAST({el(a, 'i')} AS DOUBLE) - CAST({el(b, 'i')} AS DOUBLE))"
        f" * (CAST({el(a, 'i')} AS DOUBLE) - CAST({el(b, 'i')} AS DOUBLE))"
    )
    if sp:
        return (
            f"aggregate(sequence(1, {_D}), CAST(0 AS DOUBLE),"
            f" (acc, i) -> acc + {term})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {_D} + 1), i -> {term})),"
        f" (acc, q) -> acc + q)"
    )


@register(
    "embed_alignment",
    oracle=f"""
    WITH lagged AS (
      SELECT label, vec_id, embedding,
             lag(embedding) OVER (PARTITION BY label ORDER BY vec_id)
               AS prev
      FROM embeddings
    ),
    prs AS (
      SELECT label, {_d2("duck", "embedding", "prev")} AS d2
      FROM lagged WHERE prev IS NOT NULL
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_pairs,
           {_F6.format(x="(sum(round(d2, 12)) / count(*))")} AS alignment
    FROM prs GROUP BY label
    """,
)
def embed_alignment(spark, sf_dir):
    """E10a: Wang-Isola alignment per label (module header) —
    positive pairs via a label-PARTITIONED lag window, indexed d²
    fold, round(12) pair terms so the mean is order-free."""
    from pyspark.sql import Window

    emb = T(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    lagged = emb.withColumn("prev", F.lag("embedding").over(w)).where(
        F.col("prev").isNotNull()
    )
    prs = lagged.select(
        "label", F.expr(_d2("spark", "embedding", "prev")).alias("d2")
    )
    return prs.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            _F6.format(x="(sum(round(d2, 12)) / count(*))")
        ).alias("alignment"),
    )


@register(
    "embed_uniformity",
    oracle=f"""
    WITH prs AS (
      SELECT a.vec_id AS va,
             {_d2("duck", "a.embedding", "b.embedding")} AS d2
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           {_F6.format(x="(sum(round(d2, 12)) / count(*))")} AS mean_d2,
           {_F6.format(
               x="ln(sum(round(exp(-2.0 * d2), 12)) / count(*))")}
             AS uniformity
    FROM prs
    """,
)
def embed_uniformity(spark, sf_dir):
    """E10b: Wang-Isola uniformity over the declared consecutive-vec
    random-pair sample (module header) — round(12) exp terms so the
    mean is order-free, one ln."""
    emb = T(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        (F.col("vec_id") - 1).alias("va"),
        F.col("embedding").alias("eb"),
    )
    prs = a.join(F.broadcast(b), "va").select(
        F.expr(_d2("spark", "ea", "eb")).alias("d2")
    )
    return prs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(_F6.format(x="(sum(round(d2, 12)) / count(*))")).alias(
            "mean_d2"
        ),
        F.expr(
            _F6.format(x="ln(sum(round(exp(-2.0 * d2), 12)) / count(*))")
        ).alias("uniformity"),
    )
