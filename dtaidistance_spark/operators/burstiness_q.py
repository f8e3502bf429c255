"""T62 — Church-Gale token burstiness and adaptation (Church & Gale
1995 "Poisson mixtures"; Church 2000 "Empirical estimates of
adaptation"): per token TYPE, how its occurrences clump across
documents — the classic lexical statistics that separate content
words (bursty: if a doc mentions it once it mentions it again) from
function-word-like tokens (Poisson-ish).  A curation pipeline reads
these next to TS33's temporal burstiness: that one is per-series over
time; this one is per-type over documents.

Per token, ALL INT64: cf = total occurrences, df1 = docs with ≥ 1,
df2 = docs with ≥ 2, Σc² over per-doc counts.  Derived (floor-1e6):

* ``adaptation`` = df2/df1 — Church's P(2+ | 1+), THE burstiness
  probability;
* ``burstiness`` = cf/df1 — mean occurrences per containing doc;
* ``vmr_n2`` (emitted as exact int64 numerator N·Σc² − cf² with N the
  doc count) — the variance-to-mean direction without a float mean.

Top-128 tokens by (cf DESC, tok) via TakeOrderedAndProject.

Scale shape: one map-side-combined (doc, token) count (the corpus
exchange), one map-side-combined token aggregate over the vocab-sized
table, the top-k a bounded heap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_TOPK = 128

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_ADAPT = "CAST(df2 AS DOUBLE) / CAST(df1 AS DOUBLE)"
_BURST = "CAST(cf AS DOUBLE) / CAST(df1 AS DOUBLE)"


@register(
    "token_burstiness",
    oracle=synth_sql(_N)
    + f"""
    , ex AS (
      SELECT doc_id, unnest(list_transform(tokens,
               t -> CAST(t AS BIGINT))) AS tok
      FROM synth
    ),
    dc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM ex GROUP BY 1, 2
    ),
    tk AS (
      SELECT tok,
             CAST(sum(c) AS BIGINT) AS cf,
             CAST(count(*) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS df2,
             CAST(sum(c * c) AS BIGINT) AS sc2
      FROM dc GROUP BY tok
    )
    SELECT tok, cf, df1, df2, sc2,
           CAST({_N} AS BIGINT) * sc2 - cf * cf AS vmr_n2,
           {_FLOOR6.format(x=_ADAPT)} AS adaptation,
           {_FLOOR6.format(x=_BURST)} AS burstiness
    FROM tk
    ORDER BY cf DESC, tok LIMIT {_TOPK}
    """,
)
def token_burstiness(spark, sf_dir):
    """T62: Church-Gale burstiness/adaptation for the top-{_TOPK}
    tokens by corpus frequency (module header) — all sufficient
    statistics int64, two floor-1e6 ratios, the variance-to-mean
    numerator exact; TakeOrderedAndProject top-k with total-order
    ties."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "tokens")
    ex = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(tokens, t -> CAST(t AS BIGINT))")
        ).alias("tok"),
    )
    dc = ex.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tk = dc.groupBy("tok").agg(
        F.sum("c").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df1"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("df2"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    return (
        tk.select(
            "tok",
            "cf",
            "df1",
            "df2",
            "sc2",
            (F.lit(_N).cast("long") * F.col("sc2") - F.col("cf") * F.col("cf"))
            .cast("long")
            .alias("vmr_n2"),
            F.expr(_FLOOR6.format(x=_ADAPT)).alias("adaptation"),
            F.expr(_FLOOR6.format(x=_BURST)).alias("burstiness"),
        )
        .orderBy(F.col("cf").desc(), "tok")
        .limit(_TOPK)
    )
