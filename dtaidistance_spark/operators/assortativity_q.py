"""T98 — degree assortativity of the token co-occurrence graph
(Newman PRL'02 "Assortative mixing in networks"): the Pearson
correlation of degrees across edge endpoints — do hubs attach to
hubs (social-graph signature, r > 0) or to leaves (technological/
biological signature, r < 0)?  Completes the graph-topology triple:
T60 reads centrality, T90 reads closure, this reads MIXING — and the
three together are the null baseline any "community structure in the
token graph" claim must beat.

Graph: T90's exact construction verbatim (fold-256 token classes,
undirected edge iff unordered bigram count ≥ 18, self-loops
dropped) — one shared provenance, gated identical edge/degree
censuses.

Exactness — the whole statistic clears to ONE integer division:
with S1 = Σ_e (j+k), S2 = Σ_e (j²+k²), S3 = Σ_e j·k over edges
(all exact INT64; degree ≤ 60, M ≈ 1.1k ⇒ 4M·S3 < 2^40),

    r = (4M·S3 − S1²) / (2M·S2 − S1²)

(Newman's eq. 4 with denominators cleared by 4M²) — a single
correctly-rounded division of exact integers, floor-1e6; NULL when
the denominator is 0 (degree-regular graph: r undefined).  Verdict
bands declared at ±0.05 (assortative / neutral / disassortative).

Honest (gated) reading — measured: r = +0.009122 on the corpus
graph (M = 1,148, S1 = 23,224, S2 = 258,550, S3 = 117,563) — dead
NEUTRAL, inside the ±0.05 band and well inside the O(1/√M) ≈ 0.03
random-graph noise floor: the token graph mixes with no degree
preference at all, consistent with T90's no-closure verdict on the
SAME edges — centrality exists (T60's PageRank spreads), but
neither closure nor mixing structure does; the planted controls
bracket the reading — a genuinely assortative double-clique graph
reads r ≫ +0.5 and a hub-and-spoke forest reads r → −1.  Gates: star K_{1,8} ≡ −1 exactly
(integer identity, not approximation); the regular-graph NULL
guard (C4 cycle); numpy recompute of S1/S2/S3/r on the corpus and
on LCG random graphs; planted assortative/disassortative controls;
the shared-graph census cross-check vs T90's pinned numbers;
corpus pins.

Scale shape: T90's plan minus the wedge join — one bigram-count
exchange, one degree exchange, one edge-side broadcast join, one
map-side-combined 4-sum aggregate; no windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql
from dtaidistance_spark.operators.triangles_q import _MOD, _NB, _THRESH

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_R = (
    "CASE WHEN (2 * m * s2 - s1 * s1) != 0 THEN"
    " CAST(4 * m * s3 - s1 * s1 AS DOUBLE)"
    " / CAST(2 * m * s2 - s1 * s1 AS DOUBLE)"
    " ELSE CAST(NULL AS DOUBLE) END"
)

_OUT = [
    "CAST(m AS BIGINT) AS n_edges",
    "CAST(s1 AS BIGINT) AS s1",
    "CAST(s2 AS BIGINT) AS s2",
    "CAST(s3 AS BIGINT) AS s3",
    _F6.format(x=_R) + " AS assortativity",
    f"CASE WHEN ({_R}) IS NULL THEN CAST(NULL AS STRING)"
    f" WHEN ({_R}) > 0.05 THEN 'assortative'"
    f" WHEN ({_R}) < -0.05 THEN 'disassortative'"
    " ELSE 'neutral' END AS mixing",
]


@register(
    "degree_assortativity",
    oracle=synth_sql(_NB)
    + f"""
    , ex AS (
      SELECT list_transform(tokens,
               t -> CAST(t % {_MOD} AS BIGINT)) AS f
      FROM synth
    ),
    bg AS (
      SELECT f[i + 1] AS a, f[i + 2] AS b
      FROM ex, LATERAL unnest(range(len(f) - 1)) AS t(i)
      WHERE f[i + 1] != f[i + 2]
    ),
    und AS (
      SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v
      FROM bg GROUP BY 1, 2 HAVING count(*) >= {_THRESH}
    ),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS n FROM und UNION ALL SELECT v FROM und)
      GROUP BY n
    ),
    ej AS (
      SELECT du.d AS j, dv.d AS k
      FROM und e
      JOIN deg du ON du.n = e.u
      JOIN deg dv ON dv.n = e.v
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(j + k) AS BIGINT) AS s1,
             CAST(sum(j * j + k * k) AS BIGINT) AS s2,
             CAST(sum(j * k) AS BIGINT) AS s3
      FROM ej
    )
    SELECT {", ".join(_OUT)} FROM s
    """,
)
def degree_assortativity(spark, sf_dir):
    """T98: Newman degree assortativity of the T90 graph (module
    header) — three INT64 edge sums, one cleared division."""
    docs = synth.sequences_df(spark, _NB).select(
        F.expr(
            f"transform(tokens, t -> CAST(t % {_MOD} AS BIGINT))"
        ).alias("f")
    )
    bg = (
        docs.select(
            F.posexplode(
                F.expr(
                    "zip_with(slice(f, 1, size(f) - 1),"
                    " slice(f, 2, size(f) - 1),"
                    " (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("i", "p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    und = (
        bg.select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= _THRESH)
        .select("u", "v")
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("j"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("k"))
    ej = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    s = ej.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("j") + F.col("k")).cast("long").alias("s1"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
        .cast("long")
        .alias("s2"),
        F.sum(F.col("j") * F.col("k")).cast("long").alias("s3"),
    )
    return s.selectExpr(*_OUT)
