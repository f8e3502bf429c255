"""T58 — Good-Turing frequency-of-frequencies table (Good 1953; the
Gale-Sampson "Simple Good-Turing" input): per source, how many token
TYPES occur exactly r times, and the Turing-discounted count
r* = (r+1)·N_{r+1}/N_r — the classic estimate of how much probability
mass belongs to unseen vocabulary (p₀ = N₁/N).  A corpus pipeline
reads this before choosing LM smoothing or vocab truncation (it is
the other half of T49's coverage curve).

Everything is INTEGER except two exact ratios: counts c, the
count-of-counts N_r, totals N are all int64; r* and p_unseen are
single divides of int64s (floor-1e6).  r* is NULL where N_{r+1} = 0
(GT undefined there — the point where Gale-Sampson switch to the
smoothed fit).

Scale shape: one map-side-combined (source, token) count (the only
corpus-sized exchange), one map-side-combined (source, r) count over
the VOCAB-sized table, a broadcast self-join on r+1, and a broadcast
per-source totals join.  Output bounded at r ≤ 32 per source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_RMAX = 32

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_RSTAR = (
    "CASE WHEN n_r1 > 0 THEN"
    " (CAST(r AS DOUBLE) + CAST(1 AS DOUBLE))"
    " * CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE)"
    " ELSE CAST(NULL AS DOUBLE) END"
)
_P0 = "CAST(n_1 AS DOUBLE) / CAST(n_total AS DOUBLE)"


@register(
    "good_turing_counts",
    oracle=synth_sql(_N)
    + f"""
    , toks AS (
      SELECT source, unnest(list_transform(tokens,
               t -> CAST(t AS BIGINT))) AS tok
      FROM synth
    ),
    tc AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok
    ),
    coc AS (
      SELECT source, c AS r, CAST(count(*) AS BIGINT) AS n_r
      FROM tc GROUP BY source, c
    ),
    tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_1
      FROM tc GROUP BY source
    ),
    joined AS (
      SELECT a.source, a.r, a.n_r,
             coalesce(b.n_r, 0) AS n_r1, t.n_total, t.n_1
      FROM coc a
      LEFT JOIN coc b ON b.source = a.source AND b.r = a.r + 1
      JOIN tot t ON t.source = a.source
      WHERE a.r <= {_RMAX}
    )
    SELECT source, r, n_r, n_r1, n_total, n_1,
           {_FLOOR6.format(x=_RSTAR)} AS r_star,
           {_FLOOR6.format(x=_P0)} AS p_unseen
    FROM joined
    """,
)
def good_turing_counts(spark, sf_dir):
    """T58: Good-Turing count-of-counts per source (module header) —
    N_r for r ≤ 32, the discounted r* = (r+1)·N_{r+1}/N_r (NULL where
    GT is undefined), and the unseen mass p₀ = N₁/N.  All counts
    int64, ratios floor-1e6.  Plan: one corpus-sized (source, token)
    count, everything after is vocab-sized with broadcast joins."""
    docs = synth.sequences_df(spark, _N).select("source", "tokens")
    toks = docs.select(
        "source",
        F.explode(
            F.expr("transform(tokens, t -> CAST(t AS BIGINT))")
        ).alias("tok"),
    )
    tc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    coc = tc.groupBy("source", F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    tot = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_total"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_1"),
    )
    nxt = coc.select(
        "source", (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    joined = (
        coc.where(F.col("r") <= _RMAX)
        .join(F.broadcast(nxt), ["source", "r"], "left")
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            "r",
            "n_r",
            F.coalesce("n_r1", F.lit(0)).cast("long").alias("n_r1"),
            "n_total",
            "n_1",
        )
    )
    return joined.select(
        "*",
        F.expr(_FLOOR6.format(x=_RSTAR)).alias("r_star"),
        F.expr(_FLOOR6.format(x=_P0)).alias("p_unseen"),
    )
