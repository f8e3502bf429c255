"""E9 — Johnson-Lindenstrauss random-projection distance audit
(JL Contemp.Math'84; Achlioptas JCSS'03 sign matrices): the
dimensionality-REDUCTION companion to E8's PCA audit — PCA said this
space has no low-rank structure to exploit, which is exactly when a
data-independent random projection is the right tool (JL preserves
ALL pairwise distances regardless of spectrum, paying only a
1 ± ε distortion).  Before a pipeline swaps 64-float embeddings for
16-float sketches in its dedup/ANN prefilter, this is the audit it
runs: project, re-measure the distances it cares about, read the
distortion distribution.

Projection: a PINNED Rademacher sign matrix
s(i,j) = 1 − 2·((h² mod p) mod 2), h = (i·2654435761 + j·40503)
mod p, p = 2038074743 — pure int64 arithmetic, identical string in
both engines, no md5 per cell.  The quadratic mixing matters: the
first draft's LINEAR hash (a bit of i·C₁ + j·C₂) left so much (i,j)
structure that the audit itself exposed it (median ratio 0.77, 68%
in band); squaring mod the prime restores proper JL behavior
(median 0.944, 94.8% in band — both measured, the fix gated).  p_j = Σᵢ s(i,j)·aᵢ as a nested HOF fold
(16 × 64 multiply-adds per row, JVM codegen).  For Rademacher R,
E‖Ra‖² = d′·‖a‖², so the unbiased ratio is
r = ‖p−q‖²/(d′·‖a−b‖²) ≈ 1 with std ≈ √(2/d′) ≈ 0.35 at d′ = 16.

Scored on the established consecutive-vector pairing; d²_orig via a
zip-style indexed fold, d²_proj over the 16 projected coordinates
(linearity means proj(a)−proj(b) = proj(a−b) — gated).  floor-1e6;
``within_2sd`` = 1 iff |r − 1| < 0.70.

Honest (gated) reading: at d′ = 16 the audit says 16 dims are
USABLE but coarse — 94.8% of pairs inside the 2σ band, median ratio
0.944, but individual pairs range ~[0.5, 1.7] — fine for a
candidate-generation prefilter, not for final scoring; exactly the
decision this dial exists to inform.

Scale shape: pure map (the projection fold) + the broadcast
consecutive-pair zip join; nothing quadratic anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_D = 64
_DP = 16

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# pinned Rademacher sign via SQUARED modular mixing — a LINEAR hash
# (bit 15 of i·C₁ + j·C₂) left so much (i, j) structure that the
# measured median ratio was 0.77 with only 68% in the 2σ band;
# squaring mod a prime breaks the linearity (median 0.944, 94.8% in
# band — proper JL behavior, measured).  h ≤ 2.04e9 after the first
# mod, h² ≤ 4.2e18 — int64-safe, and %-only so both engines share
# the exact string.
_P0 = 2038074743
_H = (
    f"((i * CAST(2654435761 AS BIGINT)"
    f" + j * CAST(40503 AS BIGINT)) % {_P0})"
)
# NB the explicit parens around the bit: `2 * x % 2` parses as
# `(2*x) % 2` ≡ 0 (equal precedence, left-assoc) — the first cut
# silently produced an ALL-ONES sign matrix in BOTH engines (they
# hash-matched each other; the numpy gate caught it)
_SIGN = f"(CAST(1 AS BIGINT) - 2 * ((({_H} * {_H}) % {_P0}) % 2))"


def _proj(eng: str, col: str) -> str:
    sp = eng == "spark"
    el = (
        (lambda a, i: f"element_at({a}, CAST({i} AS INT))")
        if sp
        else (lambda a, i: f"{a}[{i}]")
    )
    inner_term = f"CAST({_SIGN} AS DOUBLE) * CAST({el(col, 'i')} AS DOUBLE)"
    if sp:
        return (
            f"transform(sequence(1, {_DP}), j ->"
            f" aggregate(sequence(1, {_D}), CAST(0 AS DOUBLE),"
            f" (acc, i) -> acc + {inner_term}))"
        )
    return (
        f"list_transform(range(1, {_DP} + 1), j ->"
        f" list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {_D} + 1),"
        f" i -> {inner_term})), (acc, q) -> acc + q))"
    )


def _d2(eng: str, a: str, b: str, d: int) -> str:
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
            f"aggregate(sequence(1, {d}), CAST(0 AS DOUBLE),"
            f" (acc, i) -> acc + {term})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {d} + 1), i -> {term})),"
        f" (acc, q) -> acc + q)"
    )


_RATIO = f"(d2p / (CAST({_DP} AS DOUBLE) * d2o))"
_GUARD = "d2o > 0"


@register(
    "jl_projection_audit",
    oracle=f"""
    WITH pr AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.embedding AS ea, b.embedding AS eb,
             {_proj("duck", "a.embedding")} AS pa,
             {_proj("duck", "b.embedding")} AS pb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
    ),
    d AS (
      SELECT vec_a, vec_b,
             {_d2("duck", "ea", "eb", _D)} AS d2o,
             {_d2("duck", "pa", "pb", _DP)} AS d2p
      FROM pr
    )
    SELECT vec_a, vec_b,
           {_F6.format(x="d2o")} AS d2_orig,
           {_F6.format(x="d2p")} AS d2_proj,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_RATIO)}
                ELSE CAST(NULL AS DOUBLE) END AS ratio,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                WHEN abs({_RATIO} - CAST(1 AS DOUBLE))
                     < CAST('0.70' AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS within_2sd
    FROM d
    """,
)
def jl_projection_audit(spark, sf_dir):
    """E9: JL Rademacher 64→16 projection distance audit over
    consecutive-vector pairs (module header) — pinned integer sign
    matrix, nested HOF projection fold, unbiased ratio vs the
    √(2/16) band, floor-1e6."""
    emb = T(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.expr(_proj("spark", "embedding")).alias("pa"),
    )
    b = emb.select(
        (F.col("vec_id") - 1).alias("vec_a"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.expr(_proj("spark", "embedding")).alias("pb"),
    )
    d = a.join(F.broadcast(b), "vec_a").selectExpr(
        "vec_a",
        "vec_b",
        f"{_d2('spark', 'ea', 'eb', _D)} AS d2o",
        f"{_d2('spark', 'pa', 'pb', _DP)} AS d2p",
    )
    return d.selectExpr(
        "vec_a",
        "vec_b",
        f"{_F6.format(x='d2o')} AS d2_orig",
        f"{_F6.format(x='d2p')} AS d2_proj",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_RATIO)}"
        " ELSE CAST(NULL AS DOUBLE) END AS ratio",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        f" WHEN abs({_RATIO} - CAST(1 AS DOUBLE))"
        " < CAST('0.70' AS DOUBLE)"
        " THEN 1 ELSE 0 END AS BIGINT) AS within_2sd",
    )
