"""TS65 — Granger causality (lag-1, BOTH directions) between paired
series (Granger Econometrica'69): the predictive-association verdict
completing the paired-series family — Kendall/Spearman read monotone
association, Wilcoxon location, cross-correlation (TS12) linear
lead-lag; Granger asks the sharper question "does A's PAST improve a
forecast of B beyond B's own past", per direction.

Per consecutive-doc pair, both series sliced to L = min(n_a, n_b) and
the m = L−1 transitions regressed:

    restricted:    z_t = α + β·u_{t−1}                (own lag)
    unrestricted:  z_t = α + β·u_{t−1} + γ·w_{t−1}    (+ other's lag)

with (z, u, w) = (b, b, a) for A→B and (a, a, b) for B→A.  The 13
transition moment sums are pure INT64 folds (each ≤ 8192·50257² ≈
2.1e13; the cleared second-moment forms m·S·· − S·S ≤ 1.7e17 — bounds
verified).  The standard centered-Gram elimination gives both SSEs
from the six cleared moments

    SSE_r ∝ Zzz − Zuz²/Zuu
    SSE_u ∝ Zzz − (Zuz²·Zww − 2·Zuz·Zwz·Zuw + Zwz²·Zuu)/(Zuu·Zww − Zuw²)

(the common 1/m scale cancels), and the Wald F with df₁ = 1 is

    F = (SSE_r − SSE_u)·(m−3)/SSE_u ,

ONE shared DOUBLE tree per direction (floor-1e6; products like
Zuu·Zww exceed int64 so the tree is all-DOUBLE over int64 inputs),
verdict F > 1.96² (F(1,∞)₀.₉₅ = z²₀.₉₇₅ — the same large-m normal
approximation the 1.96 family uses, m−3 ≥ 60 everywhere, declared).
NULL-guarded at Zuu ≤ 0, singular Gram, or SSE_u ≤ 0.

Honest (gated) reading: the paired docs are INDEPENDENT series, so a
calibrated test rejects at ≈ the nominal 5% rate in each direction —
the Granger complement of TS60's correct sizing on null data.

Scale shape: ZERO exchanges beyond the 1-row-per-pair broadcast zip
join of consecutive docs; all folds linear in L.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _folds(eng: str) -> dict[str, str]:
    """13 transition moment folds over t = 2..L (1-indexed arrays
    xa/xb, both pre-sliced to L = min length; column m = L−1)."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, {i})") if sp else (
        lambda a, i: f"{a}[{i}]"
    )

    def fold(term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(2, CAST(m AS INT) + 1),"
                f" CAST(0 AS BIGINT), (acc, t) -> acc + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(2, CAST(m AS INT) + 2),"
            f" t -> CAST({term} AS BIGINT))), (acc, q) -> acc + q)"
        )

    a1, b1 = el("xa", "t - 1"), el("xb", "t - 1")
    az, bz = el("xa", "t"), el("xb", "t")
    return {
        "sa1": fold(a1),
        "sb1": fold(b1),
        "saz": fold(az),
        "sbz": fold(bz),
        "sa1a1": fold(f"{a1} * {a1}"),
        "sb1b1": fold(f"{b1} * {b1}"),
        "sazaz": fold(f"{az} * {az}"),
        "sbzbz": fold(f"{bz} * {bz}"),
        "sa1b1": fold(f"{a1} * {b1}"),
        "sa1az": fold(f"{a1} * {az}"),
        "sb1bz": fold(f"{b1} * {bz}"),
        "sa1bz": fold(f"{a1} * {bz}"),
        "sb1az": fold(f"{b1} * {az}"),
    }


# cleared centered moments, int64 (≤ 1.7e17): direction A→B has
# (z, u, w) = (b_t, b_{t−1}, a_{t−1}); B→A swaps the roles.
_Z = {
    "zuu_ab": "m * sb1b1 - sb1 * sb1",
    "zww_ab": "m * sa1a1 - sa1 * sa1",
    "zuw_ab": "m * sa1b1 - sa1 * sb1",
    "zuz_ab": "m * sb1bz - sb1 * sbz",
    "zwz_ab": "m * sa1bz - sa1 * sbz",
    "zzz_ab": "m * sbzbz - sbz * sbz",
    "zuz_ba": "m * sa1az - sa1 * saz",
    "zwz_ba": "m * sb1az - sb1 * saz",
    "zzz_ba": "m * sazaz - saz * saz",
}


def _f_tree(zuu: str, zww: str, zuw: str, zuz: str, zwz: str,
            zzz: str) -> str:
    """Shared Wald-F DOUBLE tree for one direction."""
    d = lambda c: f"CAST({c} AS DOUBLE)"  # noqa: E731
    det = f"({d(zuu)} * {d(zww)} - {d(zuw)} * {d(zuw)})"
    sse_r = f"({d(zzz)} - {d(zuz)} * {d(zuz)} / {d(zuu)})"
    num_u = (
        f"({d(zuz)} * {d(zuz)} * {d(zww)}"
        f" - 2.0 * {d(zuz)} * {d(zwz)} * {d(zuw)}"
        f" + {d(zwz)} * {d(zwz)} * {d(zuu)})"
    )
    sse_u = f"({d(zzz)} - {num_u} / {det})"
    f_ = (
        f"(({sse_r} - {sse_u}) * (CAST(m AS DOUBLE) - 3.0) / {sse_u})"
    )
    return (
        f"CASE WHEN {zuu} > 0 AND {det} > 0.0 AND {sse_u} > 0.0"
        f" THEN {f_} ELSE CAST(NULL AS DOUBLE) END"
    )


_F_AB = _f_tree("zuu_ab", "zww_ab", "zuw_ab", "zuz_ab", "zwz_ab",
                "zzz_ab")
# B→A: u-side moments are the a-lags, w-side the b-lags; Zuw unchanged
_F_BA = _f_tree("zww_ab", "zuu_ab", "zuw_ab", "zuz_ba", "zwz_ba",
                "zzz_ba")

_REJ = (
    "CAST(CASE WHEN ({f}) IS NULL THEN NULL"
    " WHEN ({f}) > 1.96 * 1.96 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "granger_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             least(a.n, b.n) - 1 AS m,
             list_slice(a.v, 1, least(a.n, b.n)) AS xa,
             list_slice(b.v, 1, least(a.n, b.n)) AS xb
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
    ),
    sums AS (
      SELECT doc_a, doc_b, m,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM prs
    ),
    zz AS (
      SELECT doc_a, doc_b, m,
             {", ".join(f"CAST({x} AS BIGINT) AS {k}"
                        for k, x in _Z.items())}
      FROM sums
    )
    SELECT doc_a, doc_b, m,
           {", ".join(_Z)},
           {_F6.format(x=_F_AB)} AS f_ab,
           {_REJ.format(f=_F_AB)} AS reject_ab,
           {_F6.format(x=_F_BA)} AS f_ba,
           {_REJ.format(f=_F_BA)} AS reject_ba
    FROM zz
    """,
)
def granger_pairs(spark, sf_dir):
    """TS65: lag-1 Granger causality F in both directions for 64
    consecutive-doc pairs (module header) — 13 int64 transition moment
    folds, cleared centered Gram, shared Wald-F DOUBLE trees,
    floor-1e6, verdict F > 1.96²."""
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, x -> CAST(x AS BIGINT))").alias("v"),
    )
    a = docs.where(F.col("i") % 2 == 0).select(
        "i",
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("v").alias("va"),
    )
    b = docs.select(
        (F.col("i") - 1).alias("i"),
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("v").alias("vb"),
    )
    prs = a.join(F.broadcast(b), "i").selectExpr(
        "doc_a",
        "doc_b",
        "least(na, nb) - 1 AS m",
        "slice(va, 1, CAST(least(na, nb) AS INT)) AS xa",
        "slice(vb, 1, CAST(least(na, nb) AS INT)) AS xb",
    )
    sums = prs.select(
        "doc_a",
        "doc_b",
        "m",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    zz = sums.select(
        "doc_a",
        "doc_b",
        "m",
        *[F.expr(x).cast("long").alias(k) for k, x in _Z.items()],
    )
    return zz.select(
        "doc_a",
        "doc_b",
        "m",
        *_Z,
        F.expr(_F6.format(x=_F_AB)).alias("f_ab"),
        F.expr(_REJ.format(f=_F_AB)).alias("reject_ab"),
        F.expr(_F6.format(x=_F_BA)).alias("f_ba"),
        F.expr(_REJ.format(f=_F_BA)).alias("reject_ba"),
    )
