"""TS59 — Mann-Whitney U / Wilcoxon rank-sum two-sample test and
Kruskal-Wallis H k-sample test between source token distributions
(Mann-Whitney AoMS'47; Wilcoxon Biometrics'45; Kruskal-Wallis
JASA'52): the rank-based LOCATION verdicts completing the drift
family — KS (T70) reads the strongest single CDF deviation, W₁ (T59)
the transport cost, χ² (T68) the binned mix; MWU answers "is one
source's token distribution stochastically LARGER", and KW asks it
across all k sources at once.  These are the tests a data-quality
pipeline runs when a tokenizer / source change might have shifted the
token-id distribution rather than reshaped it.

Exactness: every sufficient statistic is INT64.  On the shared
integer support, the midrank algebra clears all halves by doubling —
for the pair (a, b) with per-value counts c_a(v), c_b(v), inclusive
cumulatives cum_a(v), cum_b(v) (the T59/T70 bucketed partitioned
prefix sums — no partition-less Window) and t = c_a + c_b:

    2·R_a = Σ_v c_a(v) · (2·(cum_a + cum_b) − t + 1)       (int64)
    2·U_a = 2·R_a − n_a·(n_a + 1)                          (int64)
    T_ab  = Σ_v (t³ − t)            (tie correction, int64)

z = (2U − n_a·n_b) / (2·√Var) with Var = n_a·n_b/12 ·
((N+1) − T/(N(N−1))) is ONE shared float tree (floor-1e6), verdict
|z| > 1.96; the rank-biserial effect size r = 1 − 2U/(n_a·n_b)
likewise.  KW uses the 3-source combined midranks (2·R_s via the
same identity with t summed over all sources) and
H = [12/(N(N+1)) · Σ R_s²/n_s − 3(N+1)] / (1 − T/(N³−N)) as one
float tree (each R_s = r2_s/2 ≤ 2⁵³ is exact in double), verdict vs
the χ²₀.₉₅(2) = −2·ln(0.05) shortest-round-trip literal.

Honest (gated) reading: the generator assigns source by doc-id hash
independent of content, so the sources ARE homogeneous — the
correctly calibrated tests fail to reject on every pair (a rejection
would be a false positive), matching T70's KS conclusion through a
different statistic.

Scale shape: identical to T59/T70 — one pivot count exchange reduces
the corpus to ≤ vocab rows, bucketed prefix sums, map-side-combined
final aggregates.  Zero partition-less windows, zero driver loops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_BK = 1024
_SRC = ("web", "code", "books")
_PAIRS = (("web", "code"), ("web", "books"), ("code", "books"))
_CHI2_95_DF2 = "5.991464547107982"  # -2 ln(0.05)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _z(a: str, b: str) -> str:
    """Shared verbatim z-statistic tree over int64 (u2, n_a, n_b, tie)."""
    na = f"CAST(n_{a} AS DOUBLE)"
    nb = f"CAST(n_{b} AS DOUBLE)"
    nn = f"CAST(n_{a} + n_{b} AS DOUBLE)"
    var = (
        f"(({na} * {nb}) / 12.0)"
        f" * (({nn} + 1.0) - CAST(t_{a}_{b} AS DOUBLE)"
        f" / ({nn} * ({nn} - 1.0)))"
    )
    return (
        f"(CAST(u2_{a}_{b} AS DOUBLE) - {na} * {nb})"
        f" / (2.0 * sqrt({var}))"
    )


def _rrb(a: str, b: str) -> str:
    # Outer parens are load-bearing: the _F6 floor template appends
    # "* 1000000.0", which would otherwise bind to the division term
    # only (the T65 precedence trap, caught live here too).
    return (
        f"(1.0 - CAST(u2_{a}_{b} AS DOUBLE)"
        f" / (CAST(n_{a} AS DOUBLE) * CAST(n_{b} AS DOUBLE)))"
    )


def _r2(a: str, b: str) -> str:
    """2·R_a for pair (a,b): Σ c_a·(2(cum_a+cum_b) − (c_a+c_b) + 1)."""
    return (
        f"c_{a} * (2 * (cum_{a} + cum_{b}) - (c_{a} + c_{b}) + 1)"
    )


def _tie(a: str, b: str) -> str:
    t = f"(c_{a} + c_{b})"
    return f"{t} * {t} * {t} - {t}"


def _r2_all(s: str) -> str:
    """2·R_s in the 3-source combined ranking."""
    cum = " + ".join(f"cum_{x}" for x in _SRC)
    t = "(" + " + ".join(f"c_{x}" for x in _SRC) + ")"
    return f"c_{s} * (2 * ({cum}) - {t} + 1)"


_TIE_ALL = (
    "(" + " + ".join(f"c_{s}" for s in _SRC) + ")"
    " * (" + " + ".join(f"c_{s}" for s in _SRC) + ")"
    " * (" + " + ".join(f"c_{s}" for s in _SRC) + ")"
    " - (" + " + ".join(f"c_{s}" for s in _SRC) + ")"
)


def _kw_h() -> str:
    """Shared verbatim KW H tree (tie-corrected)."""
    nn = "CAST(" + " + ".join(f"n_{s}" for s in _SRC) + " AS DOUBLE)"
    rsq = " + ".join(
        f"(CAST(r2_{s} AS DOUBLE) / 2.0) * (CAST(r2_{s} AS DOUBLE) / 2.0)"
        f" / CAST(n_{s} AS DOUBLE)"
        for s in _SRC
    )
    h0 = f"(12.0 / ({nn} * ({nn} + 1.0))) * ({rsq}) - 3.0 * ({nn} + 1.0)"
    corr = (
        f"1.0 - CAST(tie_sum AS DOUBLE)"
        f" / ({nn} * {nn} * {nn} - {nn})"
    )
    return f"({h0}) / ({corr})"


# DuckDB CTE chain shared by both oracles: per-value source counts,
# bucketed inclusive prefix sums, totals.
def _cums_sql() -> str:
    return f"""
    , ex AS (
      SELECT source, unnest(list_transform(tokens,
               t -> CAST(t AS BIGINT))) AS tok
      FROM synth
    ),
    piv AS (
      SELECT tok,
             {", ".join(
                 "CAST(sum(CASE WHEN source = '" + s
                 + "' THEN 1 ELSE 0 END) AS BIGINT) AS c_" + s
                 for s in _SRC)}
      FROM ex GROUP BY tok
    ),
    cums AS (
      SELECT tok,
             {", ".join(f"c_{s}" for s in _SRC)},
             {", ".join(
                 "CAST(sum(c_" + s + ") OVER (ORDER BY tok) AS BIGINT)"
                 " AS cum_" + s for s in _SRC)}
      FROM piv
    ),
    tot AS (
      SELECT {", ".join(
          "CAST(sum(c_" + s + ") AS BIGINT) AS n_" + s for s in _SRC)}
      FROM piv
    )
"""


@register(
    "mannwhitney_sources",
    oracle=synth_sql(_N)
    + _cums_sql()
    + f"""
    , sums AS (
      SELECT
        {", ".join(
            f"CAST(sum({_r2(a, b)}) AS BIGINT) AS r2_{a}_{b},"
            f" CAST(sum({_tie(a, b)}) AS BIGINT) AS t_{a}_{b}"
            for a, b in _PAIRS)}
      FROM cums
    ),
    us AS (
      SELECT sums.*, tot.*,
        {", ".join(
            f"r2_{a}_{b} - n_{a} * (n_{a} + 1) AS u2_{a}_{b}"
            for a, b in _PAIRS)}
      FROM sums, tot
    )
    {" UNION ALL ".join(
        f"SELECT '{a}' AS src_a, '{b}' AS src_b,"
        f" n_{a} AS n_a, n_{b} AS n_b,"
        f" r2_{a}_{b} AS r2_a, u2_{a}_{b} AS u2_a,"
        f" t_{a}_{b} AS tie_sum, "
        + _F6.format(x=_z(a, b)) + " AS z, "
        + _F6.format(x=_rrb(a, b)) + " AS r_rb,"
        + f" CAST(CASE WHEN abs({_z(a, b)}) > 1.96 THEN 1 ELSE 0 END"
        + " AS BIGINT) AS reject_shift FROM us"
        for a, b in _PAIRS)}
    """,
)
def mannwhitney_sources(spark, sf_dir):
    """TS59: Mann-Whitney U between source unigram distributions
    (module header) — int64 doubled midrank sums over the T59/T70
    bucketed prefix sums; z and rank-biserial r one shared float tree
    each, verdict |z| > 1.96."""
    cums, tot = _cums_spark(spark)
    sums = cums.agg(
        *[
            x
            for a, b in _PAIRS
            for x in (
                F.sum(F.expr(_r2(a, b))).cast("long").alias(f"r2_{a}_{b}"),
                F.sum(F.expr(_tie(a, b))).cast("long").alias(f"t_{a}_{b}"),
            )
        ]
    )
    us = sums.crossJoin(F.broadcast(tot)).select(
        "*",
        *[
            F.expr(f"r2_{a}_{b} - n_{a} * (n_{a} + 1)").alias(f"u2_{a}_{b}")
            for a, b in _PAIRS
        ],
    )
    parts = []
    for a, b in _PAIRS:
        parts.append(
            us.select(
                F.lit(a).alias("src_a"),
                F.lit(b).alias("src_b"),
                F.col(f"n_{a}").alias("n_a"),
                F.col(f"n_{b}").alias("n_b"),
                F.col(f"r2_{a}_{b}").alias("r2_a"),
                F.col(f"u2_{a}_{b}").alias("u2_a"),
                F.col(f"t_{a}_{b}").alias("tie_sum"),
                F.expr(_F6.format(x=_z(a, b))).alias("z"),
                F.expr(_F6.format(x=_rrb(a, b))).alias("r_rb"),
                F.expr(
                    f"CAST(CASE WHEN abs({_z(a, b)}) > 1.96"
                    f" THEN 1 ELSE 0 END AS BIGINT)"
                ).alias("reject_shift"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "kruskal_wallis_sources",
    oracle=synth_sql(_N)
    + _cums_sql()
    + f"""
    , sums AS (
      SELECT
        {", ".join(
            f"CAST(sum({_r2_all(s)}) AS BIGINT) AS r2_{s}" for s in _SRC)},
        CAST(sum({_TIE_ALL}) AS BIGINT) AS tie_sum
      FROM cums
    )
    SELECT {", ".join(f"n_{s}" for s in _SRC)},
           {", ".join(f"r2_{s}" for s in _SRC)},
           tie_sum,
           {_F6.format(x=_kw_h())} AS h,
           CAST('{_CHI2_95_DF2}' AS DOUBLE) AS crit_05,
           CAST(CASE WHEN {_kw_h()} > CAST('{_CHI2_95_DF2}' AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_same
    FROM sums, tot
    """,
)
def kruskal_wallis_sources(spark, sf_dir):
    """TS59: Kruskal-Wallis H across the three sources (module
    header) — int64 doubled midrank sums in the combined ranking,
    tie-corrected H one shared float tree, verdict vs χ²₀.₉₅(2)."""
    cums, tot = _cums_spark(spark)
    sums = cums.agg(
        *[
            F.sum(F.expr(_r2_all(s))).cast("long").alias(f"r2_{s}")
            for s in _SRC
        ],
        F.sum(F.expr(_TIE_ALL)).cast("long").alias("tie_sum"),
    )
    return sums.crossJoin(F.broadcast(tot)).select(
        *[F.col(f"n_{s}") for s in _SRC],
        *[F.col(f"r2_{s}") for s in _SRC],
        "tie_sum",
        F.expr(_F6.format(x=_kw_h())).alias("h"),
        F.expr(f"CAST('{_CHI2_95_DF2}' AS DOUBLE)").alias("crit_05"),
        F.expr(
            f"CAST(CASE WHEN {_kw_h()} >"
            f" CAST('{_CHI2_95_DF2}' AS DOUBLE)"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_same"),
    )


def _cums_spark(spark):
    """(cums, tot): per-value counts + inclusive cumulatives per source
    via the T59/T70 bucketed partitioned prefix sums."""
    docs = synth.sequences_df(spark, _N).select("source", "tokens")
    ex = docs.select(
        "source",
        F.explode(
            F.expr("transform(tokens, t -> CAST(t AS BIGINT))")
        ).alias("tok"),
    )
    piv = ex.groupBy("tok").agg(
        *[
            F.sum(F.when(F.col("source") == s, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{s}")
            for s in _SRC
        ]
    )
    piv = piv.withColumn("bk", F.expr(f"tok DIV {_BK}"))
    wb = (
        Window.partitionBy("bk")
        .orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = piv.select(
        "tok",
        "bk",
        *[F.col(f"c_{s}") for s in _SRC],
        *[
            F.sum(f"c_{s}").over(wb).cast("long").alias(f"w_{s}")
            for s in _SRC
        ],
    )
    btot = piv.groupBy("bk").agg(
        *[F.sum(f"c_{s}").cast("long").alias(f"t_{s}") for s in _SRC]
    )
    boff = (
        btot.alias("hi")
        .join(btot.alias("lo"), F.col("lo.bk") < F.col("hi.bk"), "left")
        .groupBy(F.col("hi.bk").alias("bk"))
        .agg(
            *[
                F.coalesce(F.sum(f"lo.t_{s}"), F.lit(0))
                .cast("long")
                .alias(f"o_{s}")
                for s in _SRC
            ]
        )
    )
    cums = within.join(F.broadcast(boff), "bk").select(
        "tok",
        *[F.col(f"c_{s}") for s in _SRC],
        *[
            (F.col(f"w_{s}") + F.col(f"o_{s}"))
            .cast("long")
            .alias(f"cum_{s}")
            for s in _SRC
        ],
    )
    tot = piv.agg(
        *[F.sum(f"c_{s}").cast("long").alias(f"n_{s}") for s in _SRC]
    )
    return cums, tot
