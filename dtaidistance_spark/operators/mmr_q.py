"""T94 — Maximal Marginal Relevance diversified top-k over embeddings
(Carbonell & Goldstein SIGIR'98): the third member of the retrieval
family — BM25 (T25) ranks by lexical relevance, RRF (T93) fuses
rank lists, and MMR is the step every production retrieval/RAG stack
runs AFTER ranking: greedily re-select so each next result is
relevant to the query but NOT redundant with what was already picked,

    pick_j = argmax_{d ∉ S} [ λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) ],

λ = 0.7 (declared), k = 10, query = the embedding of the smallest
vec_id (declared; excluded from candidates), rel and sim both unit
cosines.  The k-center (T64) and SemDeDup (T26) dials bracket this
one: pure diversity and pure dedup; MMR is the tunable point between
them, and the emitted (rel, maxsim, score) triple per pick shows the
relevance-vs-redundancy price paid at each step.

Determinism & exactness: cosines via ORDER-PINNED 64-term folds,
round(12) (the E13 convention) — engine-identical doubles; λ pinned
as shortest-round-trip STRING literals (CAST('0.7' AS DOUBLE), the
documented decimal-constant-folding hazard); argmax under the
(score DESC, vec_id ASC) total order; the running
max_{s∈S} sim(d, s) maintained by an order-free ``greatest`` chain.
All 10 picks are therefore bit-exact across engines.  Pick 1 is pure
relevance (max-sim over the empty set read as 0; emitted NULL,
declared).

Honest (gated) reading — measured (sf0.001 fixture): on the
isotropic corpus the redundancy term barely binds — the picks' rel
spans 0.3345 → 0.2745 while maxsim at pick time stays in
[0.0436, 0.2701] (scores 0.2341 → 0.1111, all positive), so MMR
re-orders but never VETOES here: isotropy means even the most
redundant pick is only ~0.27-similar to the list, a fifth dial
reading the same geometry E8/E11/E12/E13 read; the contrast gate
shows what the dial is FOR — on a corpus with 3 planted
near-duplicate clusters, plain relevance top-k returns one cluster
over and over while MMR(λ=0.7) covers all three clusters within
the first 3 picks.  Gates: full numpy recompute of all 10
picks (greedy loop, same rounding); the λ=1 degeneration (MMR ≡
relevance top-k, bit-equal); the planted-cluster coverage contrast;
first-pick = argmax rel; corpus pins.

Scale shape: rel computed in ONE corpus scan; each round is one scan
against ≤ k broadcast literal pick-vectors + TakeOrderedAndProject(1)
(k bounded driver collects of one row — the T64/quantizer
precedent); the DuckDB oracle unrolls the same 10 stages
MATERIALIZED (the BPE/PageRank/T64 precedent).  At 100 TB the
candidate set entering MMR is the upstream retriever's top-N
(bounded), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 10
_LAM = "CAST('0.7' AS DOUBLE)"
_LAM1 = "CAST('0.3' AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _cos(eng: str, a: str, b: str) -> str:
    """Order-pinned unit cosine, round(12) — the E13 fold posture."""
    if eng == "spark":
        el = lambda c, i: f"element_at({c}, CAST({i} AS INT))"  # noqa: E731
        fold = (
            "aggregate(sequence(1, 64), CAST(0 AS DOUBLE),"
            " (acc, i) -> acc + ({t}))"
        )
    else:
        el = lambda c, i: f"{c}[{i}]"  # noqa: E731
        fold = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            " list_transform(range(1, 65),"
            " i -> CAST({t} AS DOUBLE))), (acc, x) -> acc + x)"
        )
    dot = fold.format(t=f"{el(a, 'i')} * {el(b, 'i')}")
    na = fold.format(t=f"{el(a, 'i')} * {el(a, 'i')}")
    nb = fold.format(t=f"{el(b, 'i')} * {el(b, 'i')}")
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 12)"


_SCORE = f"({_LAM} * rel - {_LAM1} * maxsim)"


def _duck_sql() -> str:
    parts = [
        f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (SELECT e AS qe FROM v ORDER BY vec_id LIMIT 1),
    m0 AS MATERIALIZED (
      SELECT v.vec_id, v.e, {_cos("duck", "v.e", "q.qe")} AS rel,
             CAST(0 AS DOUBLE) AS maxsim
      FROM v, q
      WHERE v.vec_id > (SELECT min(vec_id) FROM v)
    )"""
    ]
    for j in range(1, _K + 1):
        parts.append(
            f"""
    , pick{j} AS (
      SELECT vec_id AS pid, e AS pe, rel AS prel,
             maxsim AS pmaxsim, {_SCORE} AS pscore
      FROM m{j - 1}
      ORDER BY {_SCORE} DESC, vec_id LIMIT 1
    ),
    m{j} AS MATERIALIZED (
      SELECT m.vec_id, m.e, m.rel,
             greatest(m.maxsim,
                      {_cos("duck", "m.e", "pick{0}.pe".format(j))})
               AS maxsim
      FROM m{j - 1} m, pick{j}
      WHERE m.vec_id != pick{j}.pid
    )"""
        )
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {j} AS sel_idx, pid, prel, pmaxsim, pscore FROM pick{j}"
        for j in range(1, _K + 1)
    )
    parts.append(
        f"""
    , sel AS ({sel})
    SELECT CAST(sel_idx AS BIGINT) AS sel_idx,
           CAST(pid AS BIGINT) AS vec_id,
           {_F6.format(x="prel")} AS rel,
           CASE WHEN sel_idx = 1 THEN CAST(NULL AS DOUBLE)
                ELSE {_F6.format(x="pmaxsim")} END AS maxsim,
           {_F6.format(x="pscore")} AS mmr_score
    FROM sel ORDER BY sel_idx
    """
    )
    return "".join(parts)


@register("mmr_diversified_topk", oracle=_duck_sql())
def mmr_diversified_topk(spark, sf_dir):
    """T94: MMR(λ=0.7) top-10 re-selection against the min-vec_id
    query (module header) — pinned cosine folds, greatest-chained
    running max-sim, one scan + TakeOrderedAndProject(1) per round;
    bit-exact picks."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    qrow = v.orderBy("vec_id").limit(1).collect()[0]
    qlit = "array(" + ", ".join(repr(float(x)) + "D" for x in qrow.e) + ")"
    cur = (
        v.where(F.col("vec_id") > int(qrow.vec_id))
        .selectExpr(
            "vec_id",
            "e",
            _cos("spark", "e", qlit) + " AS rel",
            "CAST(0 AS DOUBLE) AS maxsim",
        )
        .persist()
    )
    rows = []
    for j in range(1, _K + 1):
        top = (
            cur.selectExpr("*", _SCORE + " AS score")
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        rows.append(
            (j, int(top.vec_id), float(top.rel), float(top.maxsim),
             float(top.score))
        )
        plit = "array(" + ", ".join(
            repr(float(x)) + "D" for x in top.e
        ) + ")"
        nxt = (
            cur.where(F.col("vec_id") != int(top.vec_id))
            .selectExpr(
                "vec_id",
                "e",
                "rel",
                f"greatest(maxsim, {_cos('spark', 'e', plit)}) AS maxsim",
            )
            .persist()
        )
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    out = spark.createDataFrame(
        rows, "sel_idx long, vec_id long, prel double, pmaxsim double,"
        " pscore double"
    )
    return out.selectExpr(
        "sel_idx",
        "vec_id",
        _F6.format(x="prel") + " AS rel",
        "CASE WHEN sel_idx = 1 THEN CAST(NULL AS DOUBLE) ELSE "
        + _F6.format(x="pmaxsim")
        + " END AS maxsim",
        _F6.format(x="pscore") + " AS mmr_score",
    ).orderBy("sel_idx")
