"""T64 — k-center greedy coreset selection over embeddings (Gonzalez
TCS'85 farthest-point traversal; Sener & Savarese ICLR'18 made it THE
baseline for training-data coreset/pruning selection): pick k = 16
vectors such that every vector is close to some pick — maximal
diversity, the opposite end of the curation spectrum from SemDeDup's
redundancy removal, with a 2-approximation guarantee on the k-center
objective.

Determinism: the seed is the smallest vec_id (declared); each round
picks argmax of the running min-distance with (mind2 DESC, vec_id)
total-order ties.  Distances are order-pinned 64-term folds (double),
engine-identical, and the per-round ``least`` chain preserves exact
equality — so all 16 picks and radii are bit-exact.  The emitted
``radius2`` of pick j is the farthest-point distance at pick time —
the classic Gonzalez coverage radius sequence (non-increasing,
asserted in pytest along with the 2-approx-defining coverage
property).

Scale shape: each round is ONE scan of the corpus computing d2 to a
BROADCAST (literal) center + a TakeOrderedAndProject(1) — k bounded
driver collects of one row each (the quantizer-training precedent);
state per row is a single double.  The DuckDB oracle unrolls the same
16 stages MATERIALIZED (the BPE/PageRank precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 16

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D2_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(range(64), k ->"
    " (CAST(v[k + 1] AS DOUBLE) - CAST(ce[k + 1] AS DOUBLE))"
    " * (CAST(v[k + 1] AS DOUBLE) - CAST(ce[k + 1] AS DOUBLE)))),"
    " (s, x) -> s + x)"
)


def _duck_sql() -> str:
    parts = [
        """
    WITH v AS (SELECT vec_id, label, embedding AS v FROM embeddings),
    pick1 AS (SELECT min(vec_id) AS cid, CAST(NULL AS DOUBLE) AS r2
              FROM v),
    c1 AS (SELECT v.v AS ce FROM v, pick1 WHERE v.vec_id = pick1.cid),
    m1 AS MATERIALIZED (
      SELECT v.vec_id, v.v, """
        + _D2_DUCK
        + """ AS mind2
      FROM v, c1
    )"""
    ]
    for j in range(2, _K + 1):
        parts.append(
            f"""
    , pick{j} AS (
      SELECT vec_id AS cid, mind2 AS r2 FROM m{j - 1}
      ORDER BY mind2 DESC, vec_id LIMIT 1
    ),
    c{j} AS (SELECT v.v AS ce FROM v, pick{j} WHERE v.vec_id = pick{j}.cid),
    m{j} AS MATERIALIZED (
      SELECT m.vec_id, m.v, least(m.mind2, {_D2_DUCK.replace("v[k", "m.v[k")})
        AS mind2
      FROM m{j - 1} m, c{j}
    )"""
        )
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {j} AS sel_idx, cid, r2 FROM pick{j}"
        for j in range(1, _K + 1)
    )
    parts.append(
        f"""
    , sel AS ({sel})
    SELECT sel.sel_idx, sel.cid AS vec_id, v.label,
           {_F6.format(x="sel.r2")} AS radius2
    FROM sel JOIN v ON v.vec_id = sel.cid
    """
    )
    return "".join(parts)


@register("kcenter_coreset", oracle=_duck_sql())
def kcenter_coreset(spark, sf_dir):
    """T64: Gonzalez k-center greedy selection of 16 embedding
    coreset points (module header) — per round one corpus scan against
    a broadcast literal center + TakeOrderedAndProject(1); bit-exact
    picks and radii."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    first = v.orderBy("vec_id").limit(1).collect()[0]
    picks = [(1, int(first.vec_id), None)]
    center = list(first.v)

    cur = v.select("vec_id", "v").withColumn(
        "ce", F.array(*[F.lit(float(x)) for x in center])
    )
    cur = cur.select(
        "vec_id",
        "v",
        F.aggregate(
            F.zip_with("v", "ce", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("mind2"),
    ).persist()
    for j in range(2, _K + 1):
        top = (
            cur.orderBy(F.col("mind2").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        picks.append((j, int(top.vec_id), float(top.mind2)))
        cvec = v.where(F.col("vec_id") == int(top.vec_id)).collect()[0].v
        nxt = cur.withColumn(
            "ce", F.array(*[F.lit(float(x)) for x in cvec])
        ).select(
            "vec_id",
            "v",
            F.least(
                F.col("mind2"),
                F.aggregate(
                    F.zip_with(
                        "v", "ce", lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            ).alias("mind2"),
        ).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    sel = spark.createDataFrame(
        [(j, vid, r2) for j, vid, r2 in picks],
        "sel_idx long, vec_id long, r2 double",
    )
    return sel.join(
        F.broadcast(
            T(spark, sf_dir, "embeddings").select("vec_id", "label")
        ),
        "vec_id",
    ).select(
        "sel_idx",
        "vec_id",
        "label",
        F.expr(_F6.format(x="r2")).alias("radius2"),
    )
