"""T71 — one-way ANOVA F-test + Brown-Forsythe variance-homogeneity
test on document LENGTHS across sources (Fisher'25; Brown-Forsythe
JASA'74, the Levene'60 test with the median center): the two
mean/variance audits a curation pipeline runs before stratifying by
source — are the sources' length profiles exchangeable, in both
location AND spread.  Completes the source-drift battery: KS/MWU/W₁/χ²
read the token distribution; these read the document-length one.

Exactness: x = n_tok is an integer, so every sufficient statistic is
INT64 — per group g: n_g, s_g = Σx, q_g = Σx² (s_g ≤ 3.4e6 means
every square in the float trees is ≤ 2⁵³ and exact in double).  For
Brown-Forsythe the group medians use the DOUBLED-median trick
(med2 = x_(⌈n/2⌉) + x_(⌊n/2⌋+1) over the sorted group array), so the
absolute deviations zd = |2x − med2| stay integer; the ×2 scale
cancels in F.  F = (SSB/(k−1))/(SSW/(N−k)) with
SSB = Σ s_g²/n_g − S²/N and SSW = Σ q_g − Σ s_g²/n_g is ONE shared
float tree (floor-1e6).

The critical value needs no table: at df₁ = k−1 = 2 the F CDF is
algebraic — P(F ≤ x) = 1 − (1 + 2x/d)^(−d/2) — so
F₀.₉₅(2, d) = d/2 · (0.05^(−2/d) − 1) is itself a shared float tree
over the int64 d = N − 3 (pow under the libm-ulp precedent).

Honest (gated) reading: source is assigned by doc-id hash independent
of length, so BOTH tests correctly fail to reject — means and spreads
are exchangeable by construction.

Scale shape: ONE map-side-combined 3-row aggregate for ANOVA; for BF
one bounded sorted-array collect per group (3 rows; at corpus scale
the median would come from an approx-quantile sketch, declared) +
one broadcast join back + a second map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_SRC = ("web", "code", "books")

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _f_tree(s: str, q: str, n: str) -> str:
    """Shared verbatim one-way F tree over per-group int64 (n, s, q)
    columns named {n}_{g}, {s}_{g}, {q}_{g}."""
    d = lambda c: f"CAST({c} AS DOUBLE)"  # noqa: E731
    within_ms = " + ".join(
        f"{d(f'{s}_{g}')} * {d(f'{s}_{g}')} / {d(f'{n}_{g}')}"
        for g in _SRC
    )
    stot = " + ".join(f"{s}_{g}" for g in _SRC)
    ntot = " + ".join(f"{n}_{g}" for g in _SRC)
    qtot = " + ".join(f"{q}_{g}" for g in _SRC)
    ssb = f"(({within_ms}) - {d(f'({stot})')} * {d(f'({stot})')} / {d(f'({ntot})')})"
    ssw = f"({d(f'({qtot})')} - ({within_ms}))"
    return f"(({ssb}) / 2.0) / (({ssw}) / ({d(f'({ntot})')} - 3.0))"


def _crit() -> str:
    """F₀.₉₅(2, d) closed form, d = N − 3 (df₁ = 2 ⇒ algebraic CDF)."""
    return (
        "(CAST(n_total - 3 AS DOUBLE) / 2.0)"
        " * (pow(0.05, -2.0 / (CAST(n_total - 3 AS DOUBLE))) - 1.0)"
    )


_NTOT = "(" + " + ".join(f"n_{g}" for g in _SRC) + ")"


@register(
    "anova_doclen_sources",
    oracle=synth_sql(_N)
    + f"""
    , grp AS (
      SELECT
        {", ".join(
            "CAST(sum(CASE WHEN source = '" + g + "' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_" + g + ","
            " CAST(sum(CASE WHEN source = '" + g + "' THEN n_tok"
            " ELSE 0 END) AS BIGINT) AS s_" + g + ","
            " CAST(sum(CASE WHEN source = '" + g + "' THEN"
            " CAST(n_tok AS BIGINT) * n_tok ELSE 0 END) AS BIGINT)"
            " AS q_" + g
            for g in _SRC)}
      FROM synth
    ),
    w AS (SELECT grp.*, {_NTOT} AS n_total FROM grp)
    SELECT {", ".join(f"n_{g}, s_{g}, q_{g}" for g in _SRC)},
           n_total,
           {_F6.format(x=_f_tree("s", "q", "n"))} AS f_stat,
           {_F6.format(x=_crit())} AS crit_05,
           CAST(CASE WHEN {_f_tree("s", "q", "n")} > {_crit()}
                THEN 1 ELSE 0 END AS BIGINT) AS reject_same_mean
    FROM w
    """,
)
def anova_doclen_sources(spark, sf_dir):
    """T71: one-way ANOVA F on n_tok across sources (module header) —
    int64 (n, Σx, Σx²) per group in one map-side-combined aggregate,
    F and the closed-form F₀.₉₅(2, d) critical value shared float
    trees, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select("source", "n_tok")
    grp = docs.agg(
        *[
            x
            for g in _SRC
            for x in (
                F.sum(F.when(F.col("source") == g, 1).otherwise(0))
                .cast("long")
                .alias(f"n_{g}"),
                F.sum(
                    F.when(F.col("source") == g, F.col("n_tok")).otherwise(0)
                )
                .cast("long")
                .alias(f"s_{g}"),
                F.sum(
                    F.when(
                        F.col("source") == g,
                        F.col("n_tok").cast("long") * F.col("n_tok"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"q_{g}"),
            )
        ]
    ).withColumn("n_total", F.expr(_NTOT))
    f = _f_tree("s", "q", "n")
    return grp.select(
        *[c for g in _SRC for c in (f"n_{g}", f"s_{g}", f"q_{g}")],
        "n_total",
        F.expr(_F6.format(x=f)).alias("f_stat"),
        F.expr(_F6.format(x=_crit())).alias("crit_05"),
        F.expr(
            f"CAST(CASE WHEN {f} > {_crit()}"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_same_mean"),
    )


@register(
    "brown_forsythe_sources",
    oracle=synth_sql(_N)
    + f"""
    , meds AS (
      SELECT source,
             CAST(list_sort(list(n_tok))[(count(*) + 1) // 2]
                  + list_sort(list(n_tok))[count(*) // 2 + 1]
                  AS BIGINT) AS med2
      FROM synth GROUP BY source
    ),
    zd AS (
      SELECT s.source,
             abs(2 * CAST(s.n_tok AS BIGINT) - m.med2) AS z
      FROM synth s JOIN meds m ON s.source = m.source
    ),
    grp AS (
      SELECT
        {", ".join(
            "CAST(sum(CASE WHEN source = '" + g + "' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_" + g + ","
            " CAST(sum(CASE WHEN source = '" + g + "' THEN z"
            " ELSE 0 END) AS BIGINT) AS sz_" + g + ","
            " CAST(sum(CASE WHEN source = '" + g + "' THEN z * z"
            " ELSE 0 END) AS BIGINT) AS qz_" + g
            for g in _SRC)}
      FROM zd
    ),
    w AS (
      SELECT grp.*, {_NTOT} AS n_total,
             {", ".join(
                 "(SELECT med2 FROM meds WHERE source = '" + g
                 + "') AS med2_" + g for g in _SRC)}
      FROM grp
    )
    SELECT {", ".join(f"med2_{g}, n_{g}, sz_{g}, qz_{g}" for g in _SRC)},
           n_total,
           {_F6.format(x=_f_tree("sz", "qz", "n"))} AS f_bf,
           {_F6.format(x=_crit())} AS crit_05,
           CAST(CASE WHEN {_f_tree("sz", "qz", "n")} > {_crit()}
                THEN 1 ELSE 0 END AS BIGINT) AS reject_same_var
    FROM w
    """,
)
def brown_forsythe_sources(spark, sf_dir):
    """T71: Brown-Forsythe (Levene-median) variance-homogeneity test
    on n_tok across sources (module header) — doubled-median integer
    deviations, same shared F tree and closed-form critical value."""
    docs = synth.sequences_df(spark, _N).select("source", "n_tok")
    meds = docs.groupBy("source").agg(
        F.expr(
            "CAST(element_at(sort_array(collect_list(n_tok)),"
            " CAST((count(*) + 1) DIV 2 AS INT))"
            " + element_at(sort_array(collect_list(n_tok)),"
            " CAST(count(*) DIV 2 + 1 AS INT)) AS BIGINT)"
        ).alias("med2")
    )
    zd = docs.join(F.broadcast(meds), "source").select(
        "source",
        F.expr("abs(2 * CAST(n_tok AS BIGINT) - med2)").alias("z"),
    )
    grp = zd.agg(
        *[
            x
            for g in _SRC
            for x in (
                F.sum(F.when(F.col("source") == g, 1).otherwise(0))
                .cast("long")
                .alias(f"n_{g}"),
                F.sum(
                    F.when(F.col("source") == g, F.col("z")).otherwise(0)
                )
                .cast("long")
                .alias(f"sz_{g}"),
                F.sum(
                    F.when(
                        F.col("source") == g, F.col("z") * F.col("z")
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"qz_{g}"),
            )
        ]
    ).withColumn("n_total", F.expr(_NTOT))
    medw = meds.groupBy().pivot("source", list(_SRC)).agg(
        F.first("med2")
    )
    medw = medw.select(
        *[F.col(g).alias(f"med2_{g}") for g in _SRC]
    )
    w = grp.crossJoin(F.broadcast(medw))
    f = _f_tree("sz", "qz", "n")
    return w.select(
        *[
            c
            for g in _SRC
            for c in (f"med2_{g}", f"n_{g}", f"sz_{g}", f"qz_{g}")
        ],
        "n_total",
        F.expr(_F6.format(x=f)).alias("f_bf"),
        F.expr(_F6.format(x=_crit())).alias("crit_05"),
        F.expr(
            f"CAST(CASE WHEN {f} > {_crit()}"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_same_var"),
    )
