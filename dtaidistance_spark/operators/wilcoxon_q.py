"""TS60 — Wilcoxon signed-rank test between paired series (Wilcoxon
Biometrics'45): the PAIRED location test completing the paired-series
family — TS58's Kendall τ reads association, TS15's Spearman monotone
correlation; the signed-rank test asks whether one series of the pair
runs systematically HIGHER, using rank magnitudes (not just signs),
the standard pre/post comparison for matched measurements.

Pairs: consecutive docs (2p, 2p+1), positionwise differences
d_i = xa_i − xb_i over the first 64 positions; zero differences are
DROPPED (the classic Wilcoxon convention), m = #kept.  All sufficient
statistics are int64 HOF counts via the doubled-midrank identity:

    2·rank_i = 2·lt_i + eq_i + 1
        lt_i = #{j kept: |d_j| < |d_i|},  eq_i = #{j: |d_j| = |d_i|}
    w2_pos  = Σ_{d_i > 0} 2·rank_i                       (= 2·W⁺)
    tie_sum = Σ_{i kept} (eq_i² − 1)      (= Σ_groups t³ − t)

z = (2·w2_pos − m(m+1)) / (4·√(m(m+1)(2m+1)/24 − tie_sum/48)) is ONE
shared float tree (floor-1e6), NULL when m < 8 or the variance is
degenerate (declared); verdict |z| > 1.96.

Honest (gated) reading: the paired docs are INDEPENDENT synthetic
series, so d is symmetric about 0 and the test rejects at ≈ the
nominal 5% rate — a handful of the 64 pairs, both z signs present —
which is exactly the calibration a correctly-sized test shows on null
data.

Scale shape: one broadcast consecutive-doc zip join (the TS58 plan);
per-row O(n²) HOF counts bounded by the 64 cap; ZERO further
exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs
_CAP = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.fil = "filter" if self.sp else "list_filter"
        self.siz = "size" if self.sp else "len"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self) -> str:
        return (
            f"sequence(0, {_CAP} - 1)" if self.sp else f"range({_CAP})"
        )

    def dexpr(self) -> str:
        """The difference array d (computed once per row)."""
        body = f"{self.el('xa', 'j + 1')} - {self.el('xb', 'j + 1')}"
        if self.sp:
            return f"transform({self.seq0()}, j -> {body})"
        return f"list_transform({self.seq0()}, j -> {body})"

    def cnt(self, term: str, keep: str) -> str:
        """Σ over kept positions i of int term(i)."""
        body = f"CASE WHEN {keep} THEN {term} ELSE 0 END"
        if self.sp:
            return (
                f"aggregate({self.seq0()}, CAST(0 AS BIGINT),"
                f" (acc, i) -> acc + ({body}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform({self.seq0()},"
            f" i -> CAST({body} AS BIGINT))), (acc, x) -> acc + x)"
        )


def _stats(e: _E) -> dict[str, str]:
    di = e.el("dd", "i + 1")
    dj = e.el("dd", "j + 1")
    lt = (
        f"{e.siz}({e.fil}({e.seq0()},"
        f" j -> {dj} != 0 AND abs({dj}) < abs({di})))"
    )
    eq = f"{e.siz}({e.fil}({e.seq0()}, j -> abs({dj}) = abs({di})))"
    kept = f"{di} != 0"
    return {
        "m": (
            f"CAST({e.siz}({e.fil}(dd, x -> x != 0)) AS BIGINT)"
        ),
        "w2_pos": e.cnt(f"2 * {lt} + {eq} + 1", f"{kept} AND {di} > 0"),
        "tie_sum": e.cnt(f"{eq} * {eq} - 1", kept),
    }


_Z = (
    "CASE WHEN m >= 8"
    " AND (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0)"
    " * (2.0 * CAST(m AS DOUBLE) + 1.0) / 24.0"
    " - CAST(tie_sum AS DOUBLE) / 48.0) > 0.0 THEN"
    " (2.0 * CAST(w2_pos AS DOUBLE)"
    " - CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0))"
    " / (4.0 * sqrt(CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0)"
    " * (2.0 * CAST(m AS DOUBLE) + 1.0) / 24.0"
    " - CAST(tie_sum AS DOUBLE) / 48.0))"
    " ELSE CAST(NULL AS DOUBLE) END"
)

_REJ = (
    "CAST(CASE WHEN ({z}) IS NULL THEN NULL"
    " WHEN abs({z}) > 1.96 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "wilcoxon_signed_rank",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.v AS xa, b.v AS xb
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
    ),
    dar AS (
      SELECT doc_a, doc_b, {_E('duck').dexpr()} AS dd FROM prs
    ),
    cc AS (
      SELECT doc_a, doc_b,
             {", ".join(f"{x} AS {k}" for k, x in _stats(_E('duck')).items())}
      FROM dar
    )
    SELECT doc_a, doc_b, m, w2_pos, tie_sum,
           {_F6.format(x=_Z)} AS z,
           {_REJ.format(z=_Z)} AS reject_equal
    FROM cc
    """,
)
def wilcoxon_signed_rank(spark, sf_dir):
    """TS60: Wilcoxon signed-rank over 64 consecutive-doc pairs
    (module header) — zero-diffs dropped, doubled midranks int64 via
    per-position HOF counts, z one shared float tree, floor-1e6."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}),"
            f" x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    a = docs.where(F.col("i") % 2 == 0).select(
        F.col("i"),
        F.col("doc_id").alias("doc_a"),
        F.col("v").alias("xa"),
    )
    b = docs.select(
        (F.col("i") - 1).alias("i"),
        F.col("doc_id").alias("doc_b"),
        F.col("v").alias("xb"),
    )
    dar = (
        a.join(F.broadcast(b), "i")
        .select("doc_a", "doc_b", F.expr(e.dexpr()).alias("dd"))
    )
    cc = dar.select(
        "doc_a",
        "doc_b",
        *[F.expr(x).alias(k) for k, x in _stats(e).items()],
    )
    return cc.select(
        "doc_a",
        "doc_b",
        "m",
        "w2_pos",
        "tie_sum",
        F.expr(_F6.format(x=_Z)).alias("z"),
        F.expr(_REJ.format(z=_Z)).alias("reject_equal"),
    )
