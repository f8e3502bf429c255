"""T90 — exact triangle count + global clustering (transitivity) of
the strong-co-occurrence token graph, by degree-ordered orientation
(Suri–Vassilvitskii WWW'11 "Counting triangles and the curse of the
last reducer"; Cohen CiSE'09; orientation bound per Chiba–Nishizeki
SICOMP'85): the first graph-TOPOLOGY dial in the registry — T60's
PageRank reads node centrality, T6's components read connectivity;
the triangle census reads CLOSURE: does "A co-occurs with B, B with
C" imply "A with C"?

Graph (declared): nodes = fold-256 token classes (the T60/T57
graph); undirected edge (u,v) iff the corpus bigram count of the
unordered pair ≥ 18 (≈ the count distribution's elbow: 1 148 strong
edges of 32 639 realized pairs, density 0.0352) — self-loops
dropped.

Algorithm — the 100 TB-shape, not the naive one: orient every edge
from the endpoint with the smaller (degree, id) key to the larger
(key = d·1000 + id, unique since both < 1000), then triangles =
wedge join (e1 ⋈ e2 on shared src) ⋈ closing oriented edge.  The
orientation bounds every node's out-degree by O(√m), so the wedge
join is Σ d_out² = O(m^{3/2}) — the Chiba–Nishizeki bound — where
the naive neighbor join is Σ d² (unbounded under skew: the "last
reducer" is exactly a hub node).  Every count INT64-exact; the only
floats are the final transitivity = 3Δ/wedges, density and their
ratio, floor-1e6.

Honest (gated) reading — measured: the strong-edge graph shows NO
closure excess — transitivity 0.0390 vs density 0.0352 (ratio
1.109, gated near 1; Δ = 136 vs the G(n,p) expectation ≈ 120,
within noise) — although each doc's congruential stream lays its
bigrams on a circulant difference class, the classes of different
docs do not compose into closed triples, so the co-occurrence
graph is Erdős–Rényi-like in its closure structure: the opposite
of a social graph (ratio ≫ 1), and the right null baseline for
any future "communities in the token graph" claim.  Gates:
K₄ hand case (4 triangles, transitivity 1); star graph (0
triangles, wedges > 0, transitivity 0); triangle-with-pendant
(1 triangle, 5 wedges ⇒ 3/5); orientation-invariance (degree
order vs id order give the same census on LCG random graphs);
G(n,p) closure band on planted random graphs; the corpus census
(256 nodes, 1 148 edges, Δ = 136, 10 464 wedges) pinned.

Scale shape: one exchange for the bigram count, one for degrees,
the oriented wedge self-join bounded by O(m^{3/2}) — no collects,
no windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_NB = 256  # docs (the T60 graph corpus)
_MOD = 256
_THRESH = 18

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _out() -> list[str]:
    trans = (
        "(3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE))"
    )
    dens = (
        "(CAST(n_edges AS DOUBLE) / (CAST(n_nodes AS DOUBLE)"
        " * (CAST(n_nodes AS DOUBLE) - 1.0) / 2.0))"
    )
    return [
        "CAST(n_nodes AS BIGINT) AS n_nodes",
        "CAST(n_edges AS BIGINT) AS n_edges",
        "CAST(n_triangles AS BIGINT) AS n_triangles",
        "CAST(n_wedges AS BIGINT) AS n_wedges",
        f"CASE WHEN n_wedges > 0 THEN {_F6.format(x=trans)}"
        " ELSE CAST(NULL AS DOUBLE) END AS transitivity",
        f"CASE WHEN n_nodes > 1 THEN {_F6.format(x=dens)}"
        " ELSE CAST(NULL AS DOUBLE) END AS density",
        f"CASE WHEN n_wedges > 0 AND n_nodes > 1"
        f" THEN {_F6.format(x=f'({trans} / {dens})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS closure_ratio",
    ]


@register(
    "triangle_census",
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
    keyed AS (
      SELECT n, d, d * 1000 + n AS k FROM deg
    ),
    orient AS (
      SELECT CASE WHEN ku.k < kv.k THEN e.u ELSE e.v END AS src,
             CASE WHEN ku.k < kv.k THEN e.v ELSE e.u END AS dst,
             CASE WHEN ku.k < kv.k THEN kv.k ELSE ku.k END AS kdst
      FROM und e
      JOIN keyed ku ON ku.n = e.u
      JOIN keyed kv ON kv.n = e.v
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM orient e1
      JOIN orient e2 ON e1.src = e2.src AND e1.kdst < e2.kdst
      JOIN orient e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    sums AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM keyed) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
             (SELECT n_triangles FROM tri) AS n_triangles,
             (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
               AS n_wedges
    )
    SELECT {", ".join(_out())} FROM sums
    """,
)
def triangle_census(spark, sf_dir):
    """T90: degree-ordered-orientation triangle census of the strong
    fold-256 co-occurrence graph (module header) — INT64 counts,
    O(m^1.5) wedge join, one float tree per ratio, floor-1e6."""
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
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= _THRESH)
        .select("u", "v")
        # five downstream aggregates reference the edge set; without
        # the persist each one replays the full synth+explode lineage
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    keyed = deg.select("n", "d", (F.col("d") * 1000 + F.col("n")).alias("k"))
    ku = keyed.select(
        F.col("n").alias("u"), F.col("k").alias("ku")
    )
    kv = keyed.select(
        F.col("n").alias("v"), F.col("k").alias("kv")
    )
    orient = (
        und.join(F.broadcast(ku), "u")
        .join(F.broadcast(kv), "v")
        .selectExpr(
            "CASE WHEN ku < kv THEN u ELSE v END AS src",
            "CASE WHEN ku < kv THEN v ELSE u END AS dst",
            "CASE WHEN ku < kv THEN kv ELSE ku END AS kdst",
        )
    )
    e1 = orient.select(
        F.col("src").alias("s1"),
        F.col("dst").alias("d1"),
        F.col("kdst").alias("k1"),
    )
    e2 = orient.select(
        F.col("src").alias("s2"),
        F.col("dst").alias("d2"),
        F.col("kdst").alias("k2"),
    )
    e3 = orient.select(
        F.col("src").alias("s3"), F.col("dst").alias("d3")
    )
    tri = (
        e1.join(e2, (F.col("s1") == F.col("s2")) & (F.col("k1") < F.col("k2")))
        .join(
            e3,
            (F.col("s3") == F.col("d1")) & (F.col("d3") == F.col("d2")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges")
    )
    nn = keyed.agg(F.count("*").cast("long").alias("n_nodes"))
    ne = und.agg(F.count("*").cast("long").alias("n_edges"))
    sums = (
        nn.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(wedges))
    )
    return sums.selectExpr(*_out())
