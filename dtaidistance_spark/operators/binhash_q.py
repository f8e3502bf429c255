"""E16 — 1-bit binary quantization ANN (sign hashing / b1: Charikar
STOC'02 SimHash geometry without the projections — the identity
hyperplanes; the modern "binary quantization" tier of production
vector stores): keep ONE BIT per dimension (the sign), search by
Hamming distance with popcount.  The 64-dim corpus collapses to
64 bits = 8 bytes/vector — a 32× shrink over float32 — and the
Hamming distance is an unbiased monotone proxy for angle:
E[hamming]/d = θ/π (the Goemans–Williamson identity, gated).

Engine shape: the sign pattern packs into TWO INT64 words of ≤ 32
bits each (a single 64-bit word would collide with the sign bit —
2⁶³ overflows signed int64; the two-word split is the portable
form), via exact integer folds Σ 2^j·[x_j > 0]; Hamming =
bit_count(xor(lo)) + bit_count(xor(hi)) — pure JVM/duck integer
ops, zero floats anywhere in the scoring path; top-10 by
(hamming ASC, vec_id ASC), fully deterministic, fully
DuckDB-oracled.  Recall measured against the exact cosine tier
exactly like the SQ8/LSH lanes.

Honest (gated) reading — measured: recall@10 = 0.2625 against the
0.25 floor — binary quantization on this worst-case corpus keeps
barely a quarter of the true neighbors, and that is the CORRECT
expectation, pinned against the sister tiers: SQ8 (8 bits/dim)
holds 0.9+ recall at 4× the storage, multi-probe LSH holds 0.86
with fan-out, b1 at 1 bit/dim sits at 0.26 — the
storage-vs-recall frontier measured at three points on one
corpus.  The E14/E15 isotropy reads explain WHY the floor is so
low here: with all pairwise angles concentrated near π/2, the
angular gaps between true top-10 and rank-50 are tiny, and 64
sign bits resolve angle only to ≈ π/√64 — production b1 lanes
work because real embeddings have anisotropic structure, and this
corpus is the adversarial case.  (In production the b1 tier is a
PREFILTER feeding exact re-ranking of 5-10× the final k — at 50
rescored candidates the effective recall recovers; the tier
composition is documented, not duplicated here.)  Gates: the
Goemans–Williamson E[hamming]/64 = θ/π identity on planted
angle-θ pairs (within binomial noise); pack/unpack round-trip
exactness; Hamming symmetry + triangle inequality spot checks;
the corpus recall + frontier-ordering pins.

Scale shape: the corpus crosses the scan as 16 bytes/vector
(two packed words); one broadcast of 8 query words; the ranking
is one partitioned window over integer distances.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import ann as A
from dtaidistance_spark.operators.queries import T, register

_NQ = 8
_DIM = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _pack(eng: str) -> dict[str, str]:
    """Two ≤ 32-bit words from the sign pattern — exact INT64
    folds."""
    sp = eng == "spark"
    el = (lambda i: f"element_at(e, {i})") if sp else (lambda i: f"e[{i}]")

    def fold(lo: int, hi: int, base: int) -> str:
        term = (
            f"CASE WHEN {el('j')} > 0 THEN"
            f" CAST(pow(2, j - 1 - {base}) AS BIGINT) ELSE 0 END"
        )
        if sp:
            return (
                f"aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT),"
                f" (a, j) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range({lo}, {hi} + 1),"
            f" j -> CAST(({term}) AS BIGINT))), (a, q) -> a + q)"
        )

    return {
        "w_lo": fold(1, 32, 0),
        "w_hi": fold(33, _DIM, 32),
    }


_HAM_SPARK = (
    "(bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi))"
)
_HAM_DUCK = (
    "(bit_count(CAST(xor(q_lo, c_lo) AS BIGINT))"
    " + bit_count(CAST(xor(q_hi, c_hi) AS BIGINT)))"
)

_B1_SQL = f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    packed AS (
      SELECT vec_id,
             {", ".join(f"{x} AS {k}"
                        for k, x in _pack("duck").items())}
      FROM v
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
             {_HAM_DUCK.replace("q_lo", "q.w_lo")
                       .replace("q_hi", "q.w_hi")
                       .replace("c_lo", "c.w_lo")
                       .replace("c_hi", "c.w_hi")} AS ham
      FROM packed q JOIN packed c
        ON q.vec_id < {_NQ} AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT query_id, nn_id, ham,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ham ASC, nn_id ASC) AS rank
      FROM scored
    )
"""


def _packed_spark(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    return emb.select(
        "vec_id",
        *[F.expr(x).alias(k) for k, x in _pack("spark").items()],
    )


@register(
    "embed_b1_topk",
    oracle=_B1_SQL
    + """
    SELECT query_id, nn_id, CAST(ham AS BIGINT) AS hamming,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def embed_b1_topk(spark, sf_dir):
    """E16: 1-bit sign-quantized Hamming top-10 (module header) —
    two packed INT64 words, popcount scoring, integer-deterministic
    ranking."""
    packed = _packed_spark(spark, sf_dir)
    q = packed.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
    )
    c = packed.select(
        F.col("vec_id").alias("nn_id"),
        F.col("w_lo").alias("c_lo"),
        F.col("w_hi").alias("c_hi"),
    )
    from pyspark.sql import Window

    pairs = q.join(
        F.broadcast(c), F.col("query_id") != F.col("nn_id")
    ).select(
        "query_id", "nn_id", F.expr(_HAM_SPARK).alias("ham")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ham").asc(), F.col("nn_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            "query_id",
            "nn_id",
            F.col("ham").cast("long").alias("hamming"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "embed_b1_recall_check",
    oracle=_B1_SQL
    + f"""
    , exact_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
             list_inner_product(q.e, c.e)
               / (sqrt(list_inner_product(q.e, q.e))
                  * sqrt(list_inner_product(c.e, c.e))) AS cos
      FROM v q JOIN v c ON q.vec_id < {_NQ} AND q.vec_id != c.vec_id
    ),
    exact_ranked AS (
      SELECT query_id, nn_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, nn_id ASC) AS rank
      FROM exact_scored
    ),
    hits AS (
      SELECT e.query_id, count(*) AS h
      FROM exact_ranked e
      JOIN ranked a ON a.query_id = e.query_id AND a.nn_id = e.nn_id
           AND a.rank <= 10
      WHERE e.rank <= 10
      GROUP BY e.query_id
    ),
    tot AS (
      SELECT CAST(coalesce(sum(h), 0) AS BIGINT) AS total_h,
             (SELECT CAST(count(DISTINCT query_id) AS BIGINT)
              FROM exact_ranked) AS n_q
      FROM hits
    )
    SELECT 'b1' AS tier,
           round(CAST(total_h AS DOUBLE)
                 / CAST(10 * n_q AS DOUBLE), 4) AS recall_at_k,
           CAST(0.25 AS DOUBLE) AS floor,
           (4 * total_h) >= (10 * n_q) AS met
    FROM tot
    """,
)
def embed_b1_recall_check(spark, sf_dir):
    """E16 recall check: measured recall@10 of the 1-bit tier vs the
    exact cosine tier, fully oracled (module header) — the 0.25
    floor is the honest worst-case-corpus expectation, the
    storage-recall frontier point below SQ8's 0.9 and LSH-mp's
    0.8.  The ``met`` verdict is INTEGER-cleared (4·Σhits ≥ 10·n_q)
    because at sf0.001 the measured recall lands EXACTLY on the
    floor and a float avg of non-dyadic h/10 terms is
    sum-order-dependent — the two engines disagreed in the last ulp
    and flipped the boundary comparison (found by the strict %.6f
    gate in round 4; the %.6g sweep was blind to it)."""
    emb = T(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < _NQ)
    approx = embed_b1_topk(spark, sf_dir)
    exact = A.brute_cosine_topk(emb, qs, k=10)
    a = approx.where(F.col("rank") <= 10).select("query_id", "nn_id")
    e = exact.where(F.col("rank") <= 10).select("query_id", "nn_id")
    tot = a.join(e, ["query_id", "nn_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("total_h")
    )
    nq = e.agg(
        F.countDistinct("query_id").cast("long").alias("n_q")
    )
    return tot.crossJoin(F.broadcast(nq)).selectExpr(
        "'b1' AS tier",
        "round(CAST(total_h AS DOUBLE)"
        " / CAST(10 * n_q AS DOUBLE), 4) AS recall_at_k",
        "CAST(0.25 AS DOUBLE) AS floor",
        "(4 * total_h) >= (10 * n_q) AS met",
    )
