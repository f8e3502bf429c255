"""T74 — Welch's unequal-variance t-test + Cohen's d between source
pairs on document lengths (Welch Biometrika'47; Satterthwaite'46;
Cohen'88): the PAIRWISE drill-down under T71's one-way ANOVA — ANOVA
says "are the three means exchangeable at once", Welch says WHICH
pair differs and by how much (Cohen's d), without assuming equal
variances (the Brown-Forsythe companion showed why that matters).

Exactness: per group the same int64 sufficient statistics as T71 —
(n, Σx, Σx²) from ONE map-side-combined aggregate; the 3-row pair
self-join is driver-trivial.  Everything after is ONE shared float
tree over int64s (floor-1e6): sample variances v = (n·q − s²)/(n(n−1))
as cleared forms, t = (x̄a − x̄b)/√(va/na + vb/nb), the
Welch-Satterthwaite df, and Cohen's d with the pooled sd.

The critical value uses Fisher's second-order expansion of the t
quantile (Fisher'25, the classic Cornish-Fisher leading term):

    t₀.₉₇₅(d) ≈ z·(1 + (z² + 1)/(4d)),  z = 1.96

— error O(d⁻²), < 5·10⁻³ for d ≥ 25 (the smallest pair lands near
d ≈ 30; the pytest gate validates the expansion against a
numerically-integrated exact t CDF at every emitted df).  Verdict
|t| > crit.

Honest (gated) reading — and a textbook robustness lesson: source is
doc-id-hash assigned independent of length, yet the books↔web pair
REJECTS (t ≈ −3.7 at sf-test) while rank-based MWU (TS59) and pooled
ANOVA (T71) stay null on the same data.  The books cell has only ~22
docs under a heavy-tailed length law (the ×4 long tail), so the
sample mean is fragile exactly where the t-test's normality premise
matters; the big-cell pair (web↔code) stays correctly null.  The gate
pins this shape: any rejecting pair must involve the small books
cell, and the web↔code pair never rejects.

Scale shape: ONE aggregate to 3 rows; the pair join is a broadcast of
3 rows — nothing scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda c: f"CAST({c} AS DOUBLE)"  # noqa: E731

# cleared per-side pieces over int64 columns (na, sa, qa, nb, sb, qb)
_VA = f"(({_D('na')} * {_D('qa')} - {_D('sa')} * {_D('sa')}) / ({_D('na')} * ({_D('na')} - 1.0)))"
_VB = f"(({_D('nb')} * {_D('qb')} - {_D('sb')} * {_D('sb')}) / ({_D('nb')} * ({_D('nb')} - 1.0)))"
_SE2 = f"({_VA} / {_D('na')} + {_VB} / {_D('nb')})"
_T = f"(({_D('sa')} / {_D('na')} - {_D('sb')} / {_D('nb')}) / sqrt({_SE2}))"
_DF = (
    f"(({_SE2} * {_SE2})"
    f" / (({_VA} / {_D('na')}) * ({_VA} / {_D('na')}) / ({_D('na')} - 1.0)"
    f" + ({_VB} / {_D('nb')}) * ({_VB} / {_D('nb')}) / ({_D('nb')} - 1.0)))"
)
_CRIT = f"(1.96 * (1.0 + (1.96 * 1.96 + 1.0) / (4.0 * {_DF})))"
_POOLSD = (
    f"sqrt((({_D('na')} - 1.0) * {_VA} + ({_D('nb')} - 1.0) * {_VB})"
    f" / ({_D('na')} + {_D('nb')} - 2.0))"
)
_COHEN = f"(({_D('sa')} / {_D('na')} - {_D('sb')} / {_D('nb')}) / {_POOLSD})"
_REJ = (
    f"CAST(CASE WHEN abs({_T}) > {_CRIT} THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "welch_ttest_sources",
    oracle=synth_sql(_N)
    + f"""
    , grp AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_tok) AS BIGINT) AS s,
             CAST(sum(CAST(n_tok AS BIGINT) * n_tok) AS BIGINT) AS q
      FROM synth GROUP BY source
    ),
    prs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.n AS na, a.s AS sa, a.q AS qa,
             b.n AS nb, b.s AS sb, b.q AS qb
      FROM grp a JOIN grp b ON a.source < b.source
    )
    SELECT src_a, src_b, na, sa, qa, nb, sb, qb,
           {_F6.format(x=_T)} AS t_stat,
           {_F6.format(x=_DF)} AS df_welch,
           {_F6.format(x=_CRIT)} AS crit_05,
           {_F6.format(x=_COHEN)} AS cohens_d,
           {_REJ} AS reject_same_mean
    FROM prs
    """,
)
def welch_ttest_sources(spark, sf_dir):
    """T74: Welch t + Cohen's d for the three source pairs (module
    header) — T71's int64 (n, Σx, Σx²) per group, one shared float
    tree for t / Welch-Satterthwaite df / the Fisher-expansion
    critical value / d, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select("source", "n_tok")
    grp = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_tok").cast("long").alias("s"),
        F.sum(F.col("n_tok").cast("long") * F.col("n_tok"))
        .cast("long")
        .alias("q"),
    )
    a = grp.select(
        F.col("source").alias("src_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = grp.select(
        F.col("source").alias("src_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("q").alias("qb"),
    )
    prs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    return prs.select(
        "src_a",
        "src_b",
        "na",
        "sa",
        "qa",
        "nb",
        "sb",
        "qb",
        F.expr(_F6.format(x=_T)).alias("t_stat"),
        F.expr(_F6.format(x=_DF)).alias("df_welch"),
        F.expr(_F6.format(x=_CRIT)).alias("crit_05"),
        F.expr(_F6.format(x=_COHEN)).alias("cohens_d"),
        F.expr(_REJ).alias("reject_same_mean"),
    )
