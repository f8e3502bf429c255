"""T59 — exact 1-D Wasserstein-1 (earth-mover) distance between the
three sources' unigram token distributions: the METRIC-aware
domain-shift measure next to T40's Jensen-Shannon (JS sees only
probability overlap; W₁ also prices HOW FAR mass must move along the
token axis — the standard drift statistic for ordered features).

Exactness: on an integer support, W₁ = Σ_t |CDF_a(t) − CDF_b(t)|·gap_t
over observed support points (the CDF is constant between them).
Clearing denominators, every term is INT64:

    num_ab = Σ_t |cum_a(t)·N_b − cum_b(t)·N_a| · gap_t,
    W₁ = num_ab / (N_a·N_b)

with the telescoping-gap bound Σ gap_t ≤ vocab span ⇒
num ≤ max|diff|·50257 ≈ 1.8e16 ≪ 2⁶³.  At the global last support
point both CDFs equal 1 so the (undefined) trailing gap multiplies an
exactly-zero term.  ONE float divide per pair, floor-1e6.

Scale shape: one map-side-combined (token → per-source counts) pivot
aggregate is the only corpus-sized exchange.  The running CDFs use the
repo's two-level distributed prefix sum (pps_systematic_sample
pattern): within-bucket PARTITIONED window cumsums (tok DIV 1024
buckets — no partition-less Window anywhere, per the test_plans gate)
plus a ~50-row bucket-offset self-join; gaps close across buckets via
the next bucket's first token.  The final three numerators are one
map-side-combined global aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_BK = 1024  # token-axis bucket width
_SRC = ("web", "code", "books")
_PAIRS = (("web", "code"), ("web", "books"), ("code", "books"))

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _emd_expr(a: str, b: str) -> str:
    return (
        f"abs(cum_{a} * n_{b} - cum_{b} * n_{a}) * gap"
    )


@register(
    "wasserstein_sources",
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
                 " AS cum_" + s for s in _SRC)},
             coalesce(lead(tok) OVER (ORDER BY tok), tok + 1) - tok
               AS gap
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
            "CAST(sum(" + _emd_expr(a, b) + ") AS BIGINT)"
            f" AS num_{a}_{b}" for a, b in _PAIRS)}
      FROM cums, tot
    )
    {" UNION ALL ".join(
        "SELECT '" + a + "' AS src_a, '" + b + "' AS src_b,"
        f" n_{a} AS n_a, n_{b} AS n_b, num_{a}_{b} AS emd_num, "
        + _FLOOR6.format(
            x=f"CAST(num_{a}_{b} AS DOUBLE)"
            f" / (CAST(n_{a} AS DOUBLE) * CAST(n_{b} AS DOUBLE))")
        + " AS emd FROM nums, tot"
        for a, b in _PAIRS)}
    """,
)
def wasserstein_sources(spark, sf_dir):
    """T59: exact W₁ between source unigram distributions (module
    header) — int64 CDF-difference numerators over the observed
    support with true inter-token gaps, two-level bucketed prefix sum
    (no partition-less Window), one float divide per pair."""
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
    w = Window.partitionBy("bk").orderBy("tok")
    wb = (
        Window.partitionBy("bk")
        .orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = piv.select(
        "tok",
        "bk",
        F.lead("tok").over(w).alias("next_in_bk"),
        *[
            F.sum(f"c_{s}").over(wb).cast("long").alias(f"w_{s}")
            for s in _SRC
        ],
    )
    btot = piv.groupBy("bk").agg(
        F.min("tok").alias("first_tok"),
        *[F.sum(f"c_{s}").cast("long").alias(f"t_{s}") for s in _SRC],
    )
    lower = btot.alias("lo")
    boff = (
        btot.alias("hi")
        .join(lower, F.col("lo.bk") < F.col("hi.bk"), "left")
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
    bnext = btot.select(
        (F.col("bk") - 1).alias("bk"),
        F.col("first_tok").alias("next_bk_first"),
    )
    cums = (
        within.join(F.broadcast(boff), "bk")
        .join(F.broadcast(bnext), "bk", "left")
        .select(
            "tok",
            *[
                (F.col(f"w_{s}") + F.col(f"o_{s}"))
                .cast("long")
                .alias(f"cum_{s}")
                for s in _SRC
            ],
            (
                F.coalesce(
                    "next_in_bk", "next_bk_first", F.col("tok") + 1
                )
                - F.col("tok")
            ).alias("gap"),
        )
    )
    tot = piv.agg(
        *[F.sum(f"c_{s}").cast("long").alias(f"n_{s}") for s in _SRC]
    )
    nums = cums.crossJoin(F.broadcast(tot)).agg(
        *[
            F.sum(F.expr(_emd_expr(a, b)))
            .cast("long")
            .alias(f"num_{a}_{b}")
            for a, b in _PAIRS
        ]
    )
    parts = []
    for a, b in _PAIRS:
        parts.append(
            nums.crossJoin(F.broadcast(tot)).select(
                F.lit(a).alias("src_a"),
                F.lit(b).alias("src_b"),
                F.col(f"n_{a}").alias("n_a"),
                F.col(f"n_{b}").alias("n_b"),
                F.col(f"num_{a}_{b}").alias("emd_num"),
                F.expr(
                    _FLOOR6.format(
                        x=f"CAST(num_{a}_{b} AS DOUBLE)"
                        f" / (CAST(n_{a} AS DOUBLE)"
                        f" * CAST(n_{b} AS DOUBLE))"
                    )
                ).alias("emd"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
