"""E14b/E15b/E11b — ANN-composed kNN-graph diagnostics (the round-3
verdict's item #2): LOF, kNN-LOO label probe, and Levina–Bickel
intrinsic dimension re-run over a BUCKETED candidate graph instead of
the brute N² pair join, so the neighborhood enumeration is the
production ANN shape (T9's banded LSH bucket join — candidates only
ever meet inside a bucket, the corpus never all-pairs) while every
downstream step reuses the brute modules' algebra VERBATIM
(lof_q.lof_from_pairs / knnloo_q.loo_from_pairs /
intrinsicdim_q.mle_from_topk and the same parameterized oracles).

Candidate enumeration (fully SQL-expressible in BOTH engines, unlike
the numpy-plane production LSH in operators/ann.py — which is the
point: the whole composition oracles): 16 tables × 4 signed random
hyperplanes, the ±1 plane entries derived from md5('lshp|'||p||'|'||i)
parity at module import and PINNED as a 4 096-entry literal (the
TS93 pinned-table convention — zero RNG, both engines read the same
constants); proj(v, p) = order-pinned 64-term fold Σ_i s(p,i)·v_i (the
identical IEEE op sequence cross-engine, so the sign bit — and hence
every bucket — is bit-equal by construction); table code = 4 sign
bits weighted 1/2/4/8, namespaced by table (bkt = t·16 + code);
candidates = DISTINCT pairs sharing ≥1 of the 16 bucket keys.

Exact-ranking property (stated because it makes recall@10 ≡ candidate
recall): distances on candidates are the TRUE pinned-fold distances,
so a brute top-10 neighbor appears in the ANN top-10 iff it is a
candidate — only the (≤ 10) truly-closer points can outrank it and
each of those that is a candidate was already ahead of it in brute
order.  ``ann_graph_recall_check`` therefore measures the one number
that governs all three compositions, and puts it in the driver
artifact as a full-value oracle row.

Honest (gated) reading — measured (sf0.001 / sf0.01): candidate
recall@10 = 0.864 / 0.867 at mean degree 128/129 of 199 possible
(64% of pairs) — the ISOTROPY WORST CASE quantified: on ~uniform
d=64 embeddings near neighbors are barely more hyperplane-concordant
than random pairs (distance concentration, the E14 lesson from the
candidate-enumeration side), so at matched recall LSH prunes little
here, while on a real clustered corpus the same 16×4 parameters prune
orders of magnitude (the production ann_lsh reading 0.85 recall at
12-bit tables is the same trade measured at production bit-depths).
The compositions inherit the approximation benignly BECAUSE of
concentration — measured against the brute twins at sf0.001:
max |LOF_ann − LOF_brute| = 0.008 on a ±1.4% LOF band (corr 0.72 —
rank noise inside a band that never fires any screen; zero flag
flips), LOO accuracy 0.110/0.110/0.087 at k=1/5/10 vs brute
0.120/0.100/0.103 — both sides AT-OR-BELOW the 0.16 majority
baseline, the chance verdict unchanged — and the MLE's corpus
median moves 33.57 → 32.17 (−4.1%; per-point relative shifts median
5.2% with a heavy tail to 1.3× on a handful of re-ranked
neighborhoods, but the saturation verdict — both readings far below
ambient 64 — is identical).  All pinned in pytest against the brute
twins, per the verdict's "recall-bounded, declared" contract.

Scale shape: one bucket-key shuffle join (the T2/T9 posture), exact
distances only on candidates, then the brute modules' window/fold
algebra; no N² stage anywhere.  At 100 TB the knobs are (tables,
bits): bits bound per-bucket occupancy (candidate degree), tables buy
recall; both engines stay bit-equal for ANY setting because the
buckets are pinned-fold signs of pinned literals.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators import intrinsicdim_q as IDQ
from dtaidistance_spark.operators import knnloo_q as KLQ
from dtaidistance_spark.operators import lof_q as LQ
from dtaidistance_spark.operators.queries import T, register

_TABLES = 16
_BITS = 4
_DIM = 64
_K = 10
_NV_LOF = 200
_NV_LOO = 300

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _sign_literals():
    """±1 plane entries from md5 parity — derived once at import,
    identical to what either engine would get from its own md5."""
    vals = []
    for p in range(_TABLES * _BITS):
        for i in range(_DIM):
            h = hashlib.md5(f"lshp|{p}|{i}".encode()).hexdigest()[:8]
            vals.append(1 if int(h, 16) % 2 == 0 else -1)
    return vals


_SIGNS = _sign_literals()

# the plane grid as a 64x64 NESTED literal, hoisted into a one-row
# cross-joined constant column ``sg`` — a flat literal INSIDE the
# lambdas is rebuilt per evaluation (measured: 3 s/row in DuckDB);
# the column reference is built once per row and indexed cheaply
_PLANES = [
    _SIGNS[p * _DIM : (p + 1) * _DIM] for p in range(_TABLES * _BITS)
]
_SG_SPARK = "array(" + ", ".join(
    "array(" + ", ".join("1.0D" if v > 0 else "-1.0D" for v in pl) + ")"
    for pl in _PLANES
) + ")"
_SG_DUCK = "[" + ", ".join(
    "[" + ", ".join("1.0" if v > 0 else "-1.0" for v in pl) + "]"
    for pl in _PLANES
) + "]"

# bit weight 1/2/4/8 spelled as a CASE (no engine shift quirks)
_W = "CASE WHEN r = 0 THEN 1 WHEN r = 1 THEN 2 WHEN r = 2 THEN 4 ELSE 8 END"


def _bkts(eng: str, emb: str) -> str:
    """16-entry array of namespaced bucket keys for one vector column
    ``emb`` (array<double>): bkt[t] = t*16 + Σ_r 2^r·[proj_{t*4+r}>0],
    projections as order-pinned folds against the ``sg`` plane column
    (products in index order, then a left-fold sum — the identical
    IEEE sequence in both engines)."""
    if eng == "spark":
        proj = (
            f"aggregate(zip_with(element_at(sg, t * {_BITS} + r + 1),"
            f" {emb}, (s, x) -> s * x), CAST(0 AS DOUBLE),"
            " (a, q) -> a + q)"
        )
        return (
            f"transform(sequence(0, {_TABLES - 1}), t -> t * 16 +"
            f" aggregate(sequence(0, {_BITS - 1}), 0, (c, r) -> c +"
            f" CASE WHEN {proj} > CAST(0 AS DOUBLE)"
            f" THEN {_W} ELSE 0 END))"
        )
    proj = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {_DIM} + 1),"
        f" i -> sg[t * {_BITS} + r + 1][i]"
        f" * {emb}[i])), (a, q) -> a + q)"
    )
    return (
        f"list_transform(range(0, {_TABLES}), t -> t * 16 +"
        f" list_reduce(list_prepend(0,"
        f" list_transform(range(0, {_BITS}), r ->"
        f" CASE WHEN {proj} > CAST(0 AS DOUBLE)"
        f" THEN {_W} ELSE 0 END)), (c, w) -> c + w))"
    )


def _cand_cte_duck(src: str, emb: str) -> str:
    """DuckDB CTE text: plane constant + bucket rows + distinct
    candidate pairs over the source CTE ``src`` (must expose vec_id +
    ``emb``)."""
    return f"""sgt AS (SELECT {_SG_DUCK} AS sg),
    bk AS (
      SELECT vec_id, unnest({_bkts("duck", emb)}) AS bkt
      FROM {src}, sgt
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nn_id
      FROM bk a JOIN bk b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
    )"""


def _spark_cands(e):
    """Distinct candidate pairs for an embedding DataFrame with
    columns (vec_id, e) — one bucket-key equi-join, never N²."""
    sgt = e.sparkSession.range(1).selectExpr(f"{_SG_SPARK} AS sg")
    bk = e.crossJoin(F.broadcast(sgt)).select(
        "vec_id", F.explode(F.expr(_bkts("spark", "e"))).alias("bkt")
    )
    a = bk.select(F.col("vec_id"), F.col("bkt"))
    b = bk.select(
        F.col("vec_id").alias("nn_id"), F.col("bkt").alias("bkt2")
    )
    return (
        a.join(
            b,
            (F.col("bkt") == F.col("bkt2"))
            & (F.col("vec_id") != F.col("nn_id")),
        )
        .select("vec_id", "nn_id")
        .distinct()
    )


# ---------------------------------------------------------------------------
# the one number that governs the compositions — fully oracled
# ---------------------------------------------------------------------------


_EUC_DUCK_AB = LQ._EUC_DUCK.replace("a_emb", "a.emb").replace(
    "b_emb", "b.emb"
)


@register(
    "ann_graph_recall_check",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < {_NV_LOF}
    ),
    {_cand_cte_duck("e", "emb")},
    bp AS (
      SELECT a.vec_id, b.vec_id AS nn_id, {_EUC_DUCK_AB} AS d
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    bknn AS (
      SELECT vec_id, nn_id FROM (
        SELECT vec_id, nn_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, nn_id) AS rank
        FROM bp
      ) WHERE rank <= {_K}
    ),
    deg AS (
      SELECT vec_id, CAST(count(*) AS BIGINT) AS c
      FROM cand GROUP BY vec_id
    ),
    hit AS (
      SELECT CAST(count(*) AS BIGINT) AS h
      FROM bknn k JOIN cand c
        ON c.vec_id = k.vec_id AND c.nn_id = k.nn_id
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_queries,
           CAST((SELECT count(*) FROM e) * {_K} AS BIGINT) AS n_true,
           (SELECT h FROM hit) AS n_hits,
           {_F6.format(
               x=f"(CAST((SELECT h FROM hit) AS DOUBLE)"
               f" / CAST((SELECT count(*) FROM e) * {_K} AS DOUBLE))")}
             AS recall_at_{_K},
           CAST((SELECT min(c) FROM deg) AS BIGINT) AS min_degree,
           {_F6.format(
               x="(CAST((SELECT sum(c) FROM deg) AS DOUBLE)"
               " / CAST((SELECT count(*) FROM deg) AS DOUBLE))")}
             AS mean_degree,
           CAST((SELECT sum(c) FROM deg) AS BIGINT) AS n_cand_pairs,
           CAST((SELECT count(*) FROM e)
                * ((SELECT count(*) FROM e) - 1) AS BIGINT)
             AS n_all_pairs
    """,
)
def ann_graph_recall_check(spark, sf_dir):
    """E14b: candidate recall@10 + degree accounting of the pinned
    md5-plane LSH graph vs the brute euclid top-10 on the LOF subset
    (module header) — the measured recall bound the three ANN
    compositions stand on, as a driver-artifact oracle row."""
    e = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _NV_LOF)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )
    cand = _spark_cands(e).persist()
    a = e.select("vec_id", F.col("e").alias("a_emb"))
    b = e.select(
        F.col("vec_id").alias("nn_id"), F.col("e").alias("b_emb")
    )
    bp = a.join(
        F.broadcast(b), F.col("vec_id") != F.col("nn_id")
    ).select("vec_id", "nn_id", F.expr(LQ._EUC_SPARK).alias("d"))
    w = Window.partitionBy("vec_id").orderBy("d", "nn_id")
    bknn = (
        bp.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _K)
        .select("vec_id", "nn_id")
    )
    deg = cand.groupBy("vec_id").agg(
        F.count("*").cast("long").alias("c")
    )
    hit = bknn.join(cand, ["vec_id", "nn_id"]).agg(
        F.count("*").cast("long").alias("h")
    )
    nq = e.agg(F.count("*").cast("long").alias("nq"))
    degagg = deg.agg(
        F.min("c").cast("long").alias("min_degree"),
        F.sum("c").cast("long").alias("sum_deg"),
        F.count("*").cast("long").alias("n_deg"),
    )
    return (
        nq.crossJoin(F.broadcast(hit))
        .crossJoin(F.broadcast(degagg))
        .selectExpr(
            "nq AS n_queries",
            f"CAST(nq * {_K} AS BIGINT) AS n_true",
            "h AS n_hits",
            _F6.format(
                x=f"(CAST(h AS DOUBLE) / CAST(nq * {_K} AS DOUBLE))"
            )
            + f" AS recall_at_{_K}",
            "min_degree",
            _F6.format(
                x="(CAST(sum_deg AS DOUBLE) / CAST(n_deg AS DOUBLE))"
            )
            + " AS mean_degree",
            "sum_deg AS n_cand_pairs",
            "CAST(nq * (nq - 1) AS BIGINT) AS n_all_pairs",
        )
    )


# ---------------------------------------------------------------------------
# the three compositions — brute algebra over the candidate graph
# ---------------------------------------------------------------------------


@register(
    "lof_ann",
    oracle=LQ._oracle(
        _cand_cte_duck("e", "emb")
        + f""",
    pairs AS (
      SELECT c.vec_id, c.nn_id,
             {_EUC_DUCK_AB.replace("a.emb", "qa.emb")
                          .replace("b.emb", "qb.emb")} AS d
      FROM cand c
      JOIN e qa ON qa.vec_id = c.vec_id
      JOIN e qb ON qb.vec_id = c.nn_id
    )"""
    ),
)
def lof_ann(spark, sf_dir):
    """E14b: LOF(k=10) with the pinned-LSH candidate graph replacing
    the brute pair join (module header) — lof_q.lof_from_pairs on the
    bucketed pair stream; same output shape as lof_embeddings."""
    e = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _NV_LOF)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )
    cand = _spark_cands(e)
    qa = e.select(F.col("vec_id"), F.col("e").alias("a_emb"))
    qb = e.select(
        F.col("vec_id").alias("nn_id"), F.col("e").alias("b_emb")
    )
    pairs = (
        cand.join(F.broadcast(qa), "vec_id")
        .join(F.broadcast(qb), "nn_id")
        .select("vec_id", "nn_id", F.expr(LQ._EUC_SPARK).alias("d"))
    )
    return LQ.lof_from_pairs(pairs)


@register(
    "knn_loo_ann",
    oracle=KLQ._oracle(
        _cand_cte_duck("e", "emb")
        + f""",
    pairs AS (
      SELECT c.vec_id, qa.label AS true_label,
             qb.label AS nn_label, c.nn_id,
             {_EUC_DUCK_AB.replace("a.emb", "qa.emb")
                          .replace("b.emb", "qb.emb")} AS d
      FROM cand c
      JOIN e qa ON qa.vec_id = c.vec_id
      JOIN e qb ON qb.vec_id = c.nn_id
    )"""
    ),
)
def knn_loo_ann(spark, sf_dir):
    """E15b: kNN leave-one-out label probe at k ∈ {1, 5, 10} with the
    pinned-LSH candidate graph (module header) —
    knnloo_q.loo_from_pairs on the bucketed pair stream; same output
    shape as knn_loo_classifier."""
    raw = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _NV_LOO)
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )
    base = (
        raw.groupBy("label")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("long").alias("n_maj"))
    )
    cand = _spark_cands(raw.select("vec_id", "e"))
    qa = raw.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.col("e").alias("a_emb"),
    )
    qb = raw.select(
        F.col("vec_id").alias("nn_id"),
        F.col("label").alias("nn_label"),
        F.col("e").alias("b_emb"),
    )
    pairs = (
        cand.join(F.broadcast(qa), "vec_id")
        .join(F.broadcast(qb), "nn_id")
        .select(
            "vec_id",
            "true_label",
            "nn_label",
            "nn_id",
            F.expr(KLQ._EUC_SPARK).alias("d"),
        )
    )
    return KLQ.loo_from_pairs(pairs, base)


@register(
    "intrinsic_dim_ann",
    oracle=IDQ._oracle(
        _cand_cte_duck("v", "e")
        + """,
    scored AS (
      SELECT c.vec_id AS query_id, c.nn_id,
             list_inner_product(q.e, cc.e)
               / (sqrt(list_inner_product(q.e, q.e))
                  * sqrt(list_inner_product(cc.e, cc.e))) AS cos,
             q.e AS qe, cc.e AS ce
      FROM cand c
      JOIN v q ON q.vec_id = c.vec_id
      JOIN v cc ON cc.vec_id = c.nn_id
    )"""
    ),
)
def intrinsic_dim_ann(spark, sf_dir):
    """E11b: Levina–Bickel MLE per point with the pinned-LSH candidate
    graph (module header) — cosine-ranked candidates feed
    intrinsicdim_q.mle_from_topk; same output shape as
    intrinsic_dim_mle."""
    emb = T(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cand = _spark_cands(v)
    qe = v.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("_q")
    )
    ce = v.select(
        F.col("vec_id").alias("nn_id"), F.col("e").alias("_c")
    )
    from dtaidistance_spark.operators.ann import _norm_dot

    scored = (
        cand.select(
            F.col("vec_id").alias("query_id"), F.col("nn_id")
        )
        .join(F.broadcast(qe), "query_id")
        .join(F.broadcast(ce), "nn_id")
        .withColumn("cosine", _norm_dot("_q", "_c"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _K)
        .select("query_id", "nn_id", "rank")
    )
    return IDQ.mle_from_topk(emb, topk)
