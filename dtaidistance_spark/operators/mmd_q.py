"""E13 — kernel Maximum Mean Discrepancy two-sample test between
embedding halves (Gretton et al. JMLR'12, the unbiased quadratic
MMD²_u; median-heuristic bandwidth per the same canon): the MODERN
distribution-equality test — E10 reads geometry vs labels, TS99
reads univariate drift via bins; MMD asks whether two VECTOR
samples come from the same distribution, sensitive to every moment
at once, which is exactly the check a pipeline runs when a new
embedding batch (new encoder version, new corpus slice) must match
the old one before mixing.

    MMD²_u = Σ_{i≠j∈A} k_ij/(n_A(n_A−1)) + Σ_{i≠j∈B} k_ij/(n_B(n_B−1))
             − 2·Σ_{i∈A,j∈B} k_ij/(n_A·n_B),
    k_ij = exp(−d²_ij/γ),   γ = median of ALL pairwise d²
    (the median heuristic, computed as the exact LOW-median order
    statistic of the 124 750 chord distances),

split = vec_id parity (declared).  Distances are the unit-sphere
chord d² = 2 − 2·cos via ORDER-PINNED 64-term folds, round(12)
(the E10/E11 convention); kernel terms round(12) before the
conditional sums (sum-order tolerance argument per E10); one
shared double tree; floor-1e6.  No analytic null is emitted —
the permutation calibration (the honest way to threshold MMD) is
the pytest gate, not a pretend χ².

Honest (gated) reading — measured: the parity halves are two
samples from ONE distribution and MMD agrees — MMD²_u =
−0.000065 (unbiasedness makes small negatives the signature
same-distribution outcome, NOT an error: E[MMD²_u] = 0 under the
null, so about half of null draws land below zero — the gate
pins the value inside the label-permutation null band and its
sign as legitimate), with bandwidth γ = 2.0011 ≈ the isotropic
chord-median 2 (yet another angle on the E8/E11/E12 isotropy
consensus).  The
discrimination lives in pytest: a +0.2-mean-shifted half reads
MMD² ≫ the 95th permutation percentile, a variance-inflated half
likewise, and the permutation null on the real halves brackets
the emitted value.

Scale shape: one 250k-pair self-join with pinned folds — this is
the VERIFICATION tier; the registry scale path is ``mmd_sampled``
(embedsample_q), which runs the identical machinery over a
deterministic md5 quarter-sample (~16× fewer pairs, modulus the
declared 100 TB tuning knob).  Two aggregates (median, then sums)
over the same pair stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_D = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _d2(eng: str) -> str:
    if eng == "spark":
        el = lambda a: f"element_at({a}, CAST(i AS INT))"  # noqa: E731
        fold = (
            f"aggregate(sequence(1, {_D}), CAST(0 AS DOUBLE),"
            " (a, i) -> a + ({t}))"
        )
    else:
        el = lambda a: f"{a}[i]"  # noqa: E731
        fold = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform(range(1, {_D} + 1),"
            " i -> CAST({t} AS DOUBLE))), (a, q) -> a + q)"
        )
    dot = fold.format(t=f"{el('ae')} * {el('be')}")
    na = fold.format(t=f"{el('ae')} * {el('ae')}")
    nb = fold.format(t=f"{el('be')} * {el('be')}")
    return (
        f"round(CAST(2 AS DOUBLE) - CAST(2 AS DOUBLE) * ({dot})"
        f" / (sqrt({na}) * sqrt({nb})), 12)"
    )


_SUMS = {
    "n_a": "SUM(CASE WHEN ga = 0 AND gb = 0 AND ia != ib"
           " THEN 1 ELSE 0 END)",
    "n_b": "SUM(CASE WHEN ga = 1 AND gb = 1 AND ia != ib"
           " THEN 1 ELSE 0 END)",
    "kaa": "SUM(CASE WHEN ga = 0 AND gb = 0 AND ia != ib"
           " THEN kv ELSE CAST(0 AS DOUBLE) END)",
    "kbb": "SUM(CASE WHEN ga = 1 AND gb = 1 AND ia != ib"
           " THEN kv ELSE CAST(0 AS DOUBLE) END)",
    "kab": "SUM(CASE WHEN ga = 0 AND gb = 1"
           " THEN kv ELSE CAST(0 AS DOUBLE) END)",
}

_DD = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731
# n_a/n_b count ordered same-group pairs = n(n−1); kab counts ordered
# A×B pairs once per direction? no — (ga=0, gb=1) selects each A–B
# pair exactly once in the full ordered cross join
_MMD = (
    f"(kaa / {_DD('n_a')} + kbb / {_DD('n_b')}"
    f" - CAST(2 AS DOUBLE) * kab / {_DD('n_ab')})"
)

_OUT = [
    "CAST(n_a AS BIGINT) AS n_ord_pairs_a",
    "CAST(n_b AS BIGINT) AS n_ord_pairs_b",
    "CAST(n_ab AS BIGINT) AS n_pairs_ab",
    f"{_F6.format(x='gam')} AS bandwidth",
    f"{_F6.format(x=_MMD)} AS mmd2_u",
]


@register(
    "mmd_embedding_halves",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(vec_id % 2 AS BIGINT) AS g
      FROM embeddings
    ),
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
def mmd_embedding_halves(spark, sf_dir):
    """E13: unbiased quadratic MMD² between vec_id-parity halves
    (module header) — pinned chord folds, exact low-median
    bandwidth, round(12) kernel terms, one shared double tree,
    floor-1e6."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.expr("CAST(vec_id % 2 AS BIGINT)").alias("g"),
    )
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
