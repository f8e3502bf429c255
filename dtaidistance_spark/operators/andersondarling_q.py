"""TS126 — two-sample Anderson–Darling rank test per source pair
(Pettitt Biometrika'76; Scholz–Stephens JASA'87 A²_akN, midrank
version; k = 2): the tail-sensitive member that completes the
two-sample family — T70's KS reads the single worst CDF gap, TS122's
CvM integrates the squared gap uniformly, TS59's MWU reads location
and TS112 reads spread; AD weights the squared CDF gap by
1/(F(1−F)), so it is the dial that fires on TAIL differences the
others discount, which is exactly where corpus length distributions
usually diverge first.

    A²_akN = (N−1)/N · Σ_{a∈{1,2}} (1/n_a) Σ_j (l_j/N) ·
             (N·M_aj − n_a·B_j)² / (B_j(N−B_j) − N·l_j/4)
    T = (A² − (k−1)) / σ_N,   reject at T ≥ 1.960
    (the Scholz–Stephens m = k−1 = 1 table value at α = 0.05)

over the distinct pooled values z_j with multiplicities l_j, sample
counts f_aj, MIDRANK cumulatives M_aj = P_aj−1 + f_aj/2 and
B_j = L_j−1 + l_j/2 (ties handled by construction, not correction).

Exactness strategy: DOUBLE the midranks (M2 = 2·prev + f, B2 =
2·prev + l — both exact INT64 via one partitioned cumulative window
per pair) and the halves clear completely:

    term_aj = l_j·(N·M2_aj − n_a·B2_j)² / (B2_j·(2N − B2_j) − N·l_j)

with BOTH sides exact INT64 (bounds: N = 341 pooled docs → numerator
≤ 341·(341·682)² ≈ 1.8e13), so each term is ONE correctly-rounded
division of exact integers — identical cross-engine; the Σ_j runs as
a PINNED-ORDER fold over the value-sorted term array (the TS107/
TS112 posture), and A² is one shared tree.  σ_N is the EXACT
Scholz–Stephens null variance of the no-ties statistic (declared
approximate under ties, the standard practice): H = Σ 1/n_a, the
harmonic h = Σ_{i<N} 1/i and the double sum g = Σ_{i<j<N}
1/((N−i)·j) computed as pinned (nested) folds from the same N, then
the published cubic-in-N coefficient polynomial for k = 2.  The
pytest gate validates σ²_N the strongest way available: it is
EXACT (to float eps) against the FULL permutation distribution of
the continuous-version A²_kN on two no-ties enumerations (C(7,3)
and C(10,4)); the midrank variant emitted here shares the exact
null mean k−1 = 1 (also enumeration-gated) but not the variance —
standardizing A²_akN by the continuous σ_N is the Scholz–Stephens
(and scipy) convention, declared.

Honest (gated) reading — measured, and the draft's all-null guess
was WRONG in exactly the way this dial exists for: T = 2.372 /
1.943 / −0.430 for books–code / books–web / code–web (A² = 2.778 /
2.478 / 0.674) — books–code REJECTS and books–web sits at the
margin, while every location/spread dial in the family (TS59 MWU,
TS112 Ansari–Mood, T70 KS, TS122 CvM) read these same pairs null.
This is the T74 finding re-confirmed through the tail-weighted
functional: the tiny books cell (n = 22) is heavy-tailed relative
to code/web, Welch's t saw it through means, the rank dials
discounted it — and AD's 1/(F(1−F)) weighting recovers it from
ranks alone.  The code–web pair (n = 89/401, the well-sampled one)
stays properly null at −0.43.  Gates: both exact enumerations
(mean ≡ 1; continuous-version variance ≡ σ²_N); numpy recompute of
every emitted column including the tie-midrank algebra; planted
location shift and planted tail-inflation both rejecting; the
corpus pins above.

Scale shape: one (source, value) count exchange reduces the corpus
to ≤ support-size rows, one partitioned cumulative window per pair,
one ≤ support-size pinned fold per (pair, sample); the σ_N folds
are O(N²) driver-free scalar work per pair row (N = pooled doc
count of the FIXED 512-doc diagnostic corpus — declared bound).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_CRIT = "1.960"  # Scholz–Stephens t_1(0.05)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# per-(pair, value) exact INT64 term pieces; {M2} is the doubled
# midrank cumulative of the sample whose term this is, {na} its size
_NUM = "(pn * {m2} - {na} * b2)"
_TERM = (
    f"CASE WHEN (b2 * (2 * pn - b2) - pn * l) > 0 THEN "
    f"CAST(l * ({_NUM} * {_NUM}) AS DOUBLE)"
    " / CAST(b2 * (2 * pn - b2) - pn * l AS DOUBLE)"
    " ELSE CAST(0 AS DOUBLE) END"
)


def _fold_terms(eng: str, which: str) -> str:
    """Pinned-order Σ_j of the per-value terms for sample ``which``
    (already value-sorted arrays ``t_{which}``)."""
    col = f"t_{which}"
    if eng == "spark":
        return (
            f"aggregate({col}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {col}),"
        " (acc, x) -> acc + x)"
    )


def _harm(eng: str) -> str:
    """h = Σ_{i=1}^{N-1} 1/i as a pinned fold."""
    if eng == "spark":
        return (
            "aggregate(sequence(1, CAST(pn - 1 AS INT)),"
            " CAST(0 AS DOUBLE), (acc, i) -> acc + CAST(1 AS DOUBLE)"
            " / CAST(i AS DOUBLE))"
        )
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(1, CAST(pn AS INT)),"
        " i -> CAST(1 AS DOUBLE) / CAST(i AS DOUBLE))),"
        " (acc, x) -> acc + x)"
    )


def _gsum(eng: str) -> str:
    """g = Σ_{i=1}^{N-2} (1/(N-i)) · Σ_{j=i+1}^{N-1} 1/j as pinned
    nested folds (O(N²) scalar work on the 3 pair rows)."""
    if eng == "spark":
        inner = (
            "aggregate(sequence(CAST(i + 1 AS INT),"
            " CAST(pn - 1 AS INT)), CAST(0 AS DOUBLE),"
            " (a2, j) -> a2 + CAST(1 AS DOUBLE) / CAST(j AS DOUBLE))"
        )
        return (
            "aggregate(sequence(1, CAST(pn - 2 AS INT)),"
            " CAST(0 AS DOUBLE), (acc, i) -> acc"
            f" + CAST(1 AS DOUBLE) / CAST(pn - i AS DOUBLE) * ({inner}))"
        )
    inner = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(CAST(i + 1 AS INT), CAST(pn AS INT)),"
        " j -> CAST(1 AS DOUBLE) / CAST(j AS DOUBLE))),"
        " (a2, x) -> a2 + x)"
    )
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(1, CAST(pn - 1 AS INT)),"
        f" i -> CAST(1 AS DOUBLE) / CAST(pn - i AS DOUBLE) * ({inner}))),"
        " (acc, x) -> acc + x)"
    )


# shared double tree from (sa2, sb2, na, nb, pn, h, g): the
# Scholz–Stephens k=2 exact null variance and the T statistic
_A2 = (
    f"(({_D('pn')} - 1.0) / ({_D('pn')} * {_D('pn')})"
    f" * (sa2 / {_D('na')} + sb2 / {_D('nb')}))"
)
_HH = f"(1.0 / {_D('na')} + 1.0 / {_D('nb')})"
_CA = f"((4.0 * g - 6.0) + (10.0 - 6.0 * g) * {_HH})"
_CB = (
    f"((2.0 * g - 4.0) * 4.0 + 8.0 * h * 2.0"
    f" + (2.0 * g - 14.0 * h - 4.0) * {_HH} - 8.0 * h + 4.0 * g - 6.0)"
)
_CC = (
    f"((6.0 * h + 2.0 * g - 2.0) * 4.0 + (4.0 * h - 4.0 * g + 6.0) * 2.0"
    f" + (2.0 * h - 6.0) * {_HH} + 4.0 * h)"
)
_CD = "((2.0 * h + 6.0) * 4.0 - 4.0 * h * 2.0)"
_VAR = (
    f"(({_CA} * {_D('pn')} * {_D('pn')} * {_D('pn')}"
    f" + {_CB} * {_D('pn')} * {_D('pn')} + {_CC} * {_D('pn')} + {_CD})"
    f" / (({_D('pn')} - 1.0) * ({_D('pn')} - 2.0) * ({_D('pn')} - 3.0)))"
)
_T = f"(({_A2} - 1.0) / sqrt({_VAR}))"
_REJ = (
    f"CAST(CASE WHEN {_T} >= CAST('{_CRIT}' AS DOUBLE)"
    " THEN 1 ELSE 0 END AS BIGINT)"
)

_OUT = [
    "src_a",
    "src_b",
    "na",
    "nb",
    "pn AS n_pooled",
    "nv AS n_blocks",
    _F6.format(x=_A2) + " AS a2_akn",
    _F6.format(x=f"sqrt({_VAR})") + " AS sigma_n",
    _F6.format(x=_T) + " AS t_stat",
    f"{_REJ} AS reject_same_dist",
]


@register(
    "anderson_darling_sources",
    oracle=synth_sql(_N)
    + f"""
    , cnt AS (
      SELECT source, CAST(n_tok AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM synth GROUP BY source, v
    ),
    srcs AS (SELECT DISTINCT source FROM cnt),
    prs0 AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    pv AS (
      SELECT p.src_a, p.src_b, cnt.v,
             CAST(sum(CASE WHEN cnt.source = p.src_a
                      THEN c ELSE 0 END) AS BIGINT) AS fa,
             CAST(sum(CASE WHEN cnt.source = p.src_b
                      THEN c ELSE 0 END) AS BIGINT) AS fb
      FROM prs0 p JOIN cnt
        ON cnt.source IN (p.src_a, p.src_b)
      GROUP BY p.src_a, p.src_b, cnt.v
    ),
    cum AS (
      SELECT src_a, src_b, v, fa, fb, fa + fb AS l,
             CAST(2 * (sum(fa) OVER w - fa) + fa AS BIGINT) AS m2a,
             CAST(2 * (sum(fb) OVER w - fb) + fb AS BIGINT) AS m2b,
             CAST(2 * (sum(fa + fb) OVER w - (fa + fb))
                  + (fa + fb) AS BIGINT) AS b2,
             CAST(sum(fa) OVER (PARTITION BY src_a, src_b) AS BIGINT)
               AS na,
             CAST(sum(fb) OVER (PARTITION BY src_a, src_b) AS BIGINT)
               AS nb
      FROM pv
      WINDOW w AS (PARTITION BY src_a, src_b ORDER BY v)
    ),
    trm AS (
      SELECT src_a, src_b, v, na, nb, na + nb AS pn,
             {_TERM.format(m2="m2a", na="na").replace("pn", "(na + nb)")}
               AS ta,
             {_TERM.format(m2="m2b", na="nb").replace("pn", "(na + nb)")}
               AS tb
      FROM cum
    ),
    fold AS (
      SELECT src_a, src_b, any_value(na) AS na, any_value(nb) AS nb,
             any_value(pn) AS pn, CAST(count(*) AS BIGINT) AS nv,
             list(ta ORDER BY v) AS t_a,
             list(tb ORDER BY v) AS t_b
      FROM trm GROUP BY src_a, src_b
    ),
    stat AS (
      SELECT src_a, src_b, na, nb, pn, nv,
             {_fold_terms("duck", "a")} AS sa2,
             {_fold_terms("duck", "b")} AS sb2,
             {_harm("duck")} AS h,
             {_gsum("duck")} AS g
      FROM fold
    )
    SELECT {", ".join(_OUT)}
    FROM stat ORDER BY src_a, src_b
    """,
)
def anderson_darling_sources(spark, sf_dir):
    """TS126: two-sample Anderson–Darling (midrank A²_akN) for the
    three source pairs (module header) — doubled-midrank INT64 core,
    one exact division per value block, pinned folds, the exact
    Scholz–Stephens null variance, floor-1e6."""
    d = synth.sequences_df(spark, _N).select(
        "source", F.col("n_tok").cast("long").alias("v")
    )
    cnt = d.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    srcs = cnt.select("source").distinct()
    prs0 = (
        srcs.select(F.col("source").alias("src_a"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("src_b"))),
            F.col("src_a") < F.col("src_b"),
        )
    )
    pv = (
        prs0.join(
            F.broadcast(cnt),
            (F.col("source") == F.col("src_a"))
            | (F.col("source") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "v")
        .agg(
            F.sum(
                F.when(F.col("source") == F.col("src_a"), F.col("c"))
                .otherwise(F.lit(0))
            ).cast("long").alias("fa"),
            F.sum(
                F.when(F.col("source") == F.col("src_b"), F.col("c"))
                .otherwise(F.lit(0))
            ).cast("long").alias("fb"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src_a", "src_b").orderBy("v")
    wp = Window.partitionBy("src_a", "src_b")
    cum = (
        pv.withColumn("l", F.col("fa") + F.col("fb"))
        .withColumn(
            "m2a",
            (2 * (F.sum("fa").over(w) - F.col("fa")) + F.col("fa"))
            .cast("long"),
        )
        .withColumn(
            "m2b",
            (2 * (F.sum("fb").over(w) - F.col("fb")) + F.col("fb"))
            .cast("long"),
        )
        .withColumn(
            "b2",
            (2 * (F.sum("l").over(w) - F.col("l")) + F.col("l"))
            .cast("long"),
        )
        .withColumn("na", F.sum("fa").over(wp).cast("long"))
        .withColumn("nb", F.sum("fb").over(wp).cast("long"))
    )
    trm = cum.selectExpr(
        "src_a",
        "src_b",
        "v",
        "na",
        "nb",
        "na + nb AS pn",
        _TERM.format(m2="m2a", na="na").replace("pn", "(na + nb)")
        + " AS ta",
        _TERM.format(m2="m2b", na="nb").replace("pn", "(na + nb)")
        + " AS tb",
    )
    fold = trm.groupBy("src_a", "src_b").agg(
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
        F.first("pn").alias("pn"),
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.expr(
            "transform(array_sort(collect_list(struct(v, ta))),"
            " s -> s.ta)"
        ).alias("t_a"),
        F.expr(
            "transform(array_sort(collect_list(struct(v, tb))),"
            " s -> s.tb)"
        ).alias("t_b"),
    )
    stat = fold.selectExpr(
        "src_a",
        "src_b",
        "na",
        "nb",
        "pn",
        "nv",
        _fold_terms("spark", "a") + " AS sa2",
        _fold_terms("spark", "b") + " AS sb2",
        _harm("spark") + " AS h",
        _gsum("spark") + " AS g",
    )
    return stat.selectExpr(*_OUT).orderBy("src_a", "src_b")
