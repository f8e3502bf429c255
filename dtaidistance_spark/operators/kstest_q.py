"""T70 — two-sample Kolmogorov-Smirnov test between source token
distributions (Kolmogorov'33/Smirnov'39): the SUP-norm drift verdict
completing the family — JS (overlap), W₁ (transport), χ² (binned
inference), KS (strongest-single-point deviation, distribution-free).

Exactness: on the shared integer support, D = max_t |CDF_a − CDF_b|
clears denominators to an INT64 max — d_num = max |cum_a·N_b −
cum_b·N_a| (max is order-free, no gap weighting needed for a sup
norm), with the same two-level bucketed prefix sums as T59 (no
partition-less Window).  D = d_num/(N_a·N_b) floor-1e6; the verdict
compares D against the large-sample critical value
c(α)·√((N_a+N_b)/(N_a·N_b)) at α = 0.05 (c = 1.358), one shared
float tree.  With N ≈ 10⁵ per source the test has power
against tiny shifts — and the honest (gated) reading is that it
correctly FAILS to reject on all three pairs: the generator assigns
source by doc-id hash, independent of token content, so the unigram
distributions are genuinely homogeneous and a rejecting test would be
a false positive.  (T59's W₁ on the same CDFs is small-but-nonzero —
a distance, not a verdict; KS supplies the verdict.)

Scale shape: identical to T59 — one pivot count exchange, bucketed
partitioned prefix sums, one map-side-combined max.
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
_C05 = "1.3581015157406195"  # sqrt(-ln(0.025)/2), KS c(0.05)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _dnum(a: str, b: str) -> str:
    return f"abs(cum_{a} * n_{b} - cum_{b} * n_{a})"


def _crit(a: str, b: str) -> str:
    return (
        f"CAST('{_C05}' AS DOUBLE)"
        f" * sqrt((CAST(n_{a} AS DOUBLE) + CAST(n_{b} AS DOUBLE))"
        f" / (CAST(n_{a} AS DOUBLE) * CAST(n_{b} AS DOUBLE)))"
    )


@register(
    "ks_test_sources",
    oracle=synth_sql(_N)
    + f"""
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
             {", ".join(
                 "CAST(sum(c_" + s + ") OVER (ORDER BY tok) AS BIGINT)"
                 " AS cum_" + s for s in _SRC)}
      FROM piv
    ),
    tot AS (
      SELECT {", ".join(
          "CAST(sum(c_" + s + ") AS BIGINT) AS n_" + s for s in _SRC)}
      FROM piv
    ),
    nums AS (
      SELECT
        {", ".join(
            "CAST(max(" + _dnum(a, b) + ") AS BIGINT)"
            f" AS d_{a}_{b}" for a, b in _PAIRS)}
      FROM cums, tot
    )
    {" UNION ALL ".join(
        "SELECT '" + a + "' AS src_a, '" + b + "' AS src_b,"
        f" n_{a} AS n_a, n_{b} AS n_b, d_{a}_{b} AS d_num, "
        + _F6.format(
            x=f"CAST(d_{a}_{b} AS DOUBLE)"
            f" / (CAST(n_{a} AS DOUBLE) * CAST(n_{b} AS DOUBLE))")
        + " AS d, "
        + _F6.format(x=_crit(a, b))
        + " AS crit_05,"
        + f" CAST(CASE WHEN CAST(d_{a}_{b} AS DOUBLE)"
        + f" / (CAST(n_{a} AS DOUBLE) * CAST(n_{b} AS DOUBLE))"
        + f" > {_crit(a, b)} THEN 1 ELSE 0 END AS BIGINT)"
        + " AS reject_same FROM nums, tot"
        for a, b in _PAIRS)}
    """,
)
def ks_test_sources(spark, sf_dir):
    """T70: two-sample KS between source unigram distributions
    (module header) — int64 sup-norm of the denominator-cleared CDF
    difference via the T59 bucketed prefix sums, verdict vs the
    large-sample critical value at α = 0.05."""
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
    nums = cums.crossJoin(F.broadcast(tot)).agg(
        *[
            F.max(F.expr(_dnum(a, b)))
            .cast("long")
            .alias(f"d_{a}_{b}")
            for a, b in _PAIRS
        ]
    )
    parts = []
    for a, b in _PAIRS:
        d_expr = (
            f"CAST(d_{a}_{b} AS DOUBLE)"
            f" / (CAST(n_{a} AS DOUBLE) * CAST(n_{b} AS DOUBLE))"
        )
        parts.append(
            nums.crossJoin(F.broadcast(tot)).select(
                F.lit(a).alias("src_a"),
                F.lit(b).alias("src_b"),
                F.col(f"n_{a}").alias("n_a"),
                F.col(f"n_{b}").alias("n_b"),
                F.col(f"d_{a}_{b}").alias("d_num"),
                F.expr(_F6.format(x=d_expr)).alias("d"),
                F.expr(_F6.format(x=_crit(a, b))).alias("crit_05"),
                F.expr(
                    f"CAST(CASE WHEN {d_expr} > {_crit(a, b)}"
                    f" THEN 1 ELSE 0 END AS BIGINT)"
                ).alias("reject_same"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
