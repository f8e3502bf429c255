"""T81 — shingle containment + Jaccard scoring over declared doc
pairs (Broder SEQUENCES'97, the containment half everyone forgets):
Jaccard is symmetric and MISSES the case a curation pipeline cares
about most — a short document wholly CONTAINED in a long one (quote
farms, boilerplate wrappers, prefix dumps).  Containment
C(A→B) = |A∩B|/|A| is the asymmetric dial; this op scores BOTH, at
word level and 4-gram-shingle level, for the established
consecutive-doc pairing (the T65 scorer posture: at corpus scale the
pair list comes from LSH candidates; the scorer itself must be
exact).

Plan shape: explode → DISTINCT (doc, shingle) (map-side combined),
equijoin on the shingle between pair sides (THE standard shingle
join — shuffle keyed by shingle, never all-pairs), one aggregate per
pair; set sizes from a pre-join group count.  Intersection counts,
set sizes all exact INT64; containment/Jaccard one divide each,
floor-1e6.  A LEFT join from the pair list restores zero-overlap
pairs (inter = 0 rows the inner join would drop — gated).

Honest (gated) reading: the 31-word shared vocabulary makes
word-level overlap NEAR-TOTAL (median word containment ≈ 1: every
doc uses most of the vocabulary) while 4-gram shingles still
separate independent docs (median shingle Jaccard ≈ 0, the
order-structure carries the signal) — exactly why shingling, not
bag-of-words, is the dedup primitive.

Scale: one fact-sized shuffle on the shingle key; Zipf-skewed
shingles (boilerplate) would hot-spot the join at 100 TB — the
standard mitigation (drop top-frequency shingles, they carry no
dedup signal) is declared, not needed at bench scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_K = 4  # shingle width


def _ratio(num: str, den: str) -> str:
    x = f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"
    return (
        f"CASE WHEN {den} > 0 THEN {_F6.format(x=x)}"
        " ELSE CAST(NULL AS DOUBLE) END"
    )


@register(
    "shingle_containment",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest(list_transform(
               range(1, len(w) - {_K} + 2),
               i -> array_to_string(list_slice(w, i, i + {_K} - 1), ' ')))
             AS s
      FROM words
    ),
    dsh AS (SELECT DISTINCT doc_id, s FROM sh),
    dw AS (
      SELECT DISTINCT doc_id, unnest(w) AS s FROM words
    ),
    sizes AS (
      SELECT d.doc_id,
             (SELECT count(*) FROM dsh WHERE dsh.doc_id = d.doc_id)
               AS n4,
             (SELECT count(*) FROM dw WHERE dw.doc_id = d.doc_id)
               AS n1
      FROM (SELECT DISTINCT doc_id FROM words) d
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, a.doc_id + 1 AS doc_b
      FROM (SELECT DISTINCT doc_id FROM words) a
      WHERE a.doc_id % 2 = 0
        AND EXISTS (SELECT 1 FROM words b WHERE b.doc_id = a.doc_id + 1)
    ),
    i4 AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter4
      FROM dsh x JOIN dsh y ON y.s = x.s AND y.doc_id = x.doc_id + 1
      WHERE x.doc_id % 2 = 0
      GROUP BY 1, 2
    ),
    i1 AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter1
      FROM dw x JOIN dw y ON y.s = x.s AND y.doc_id = x.doc_id + 1
      WHERE x.doc_id % 2 = 0
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           CAST(sa.n4 AS BIGINT) AS na4, CAST(sb.n4 AS BIGINT) AS nb4,
           CAST(coalesce(i4.inter4, 0) AS BIGINT) AS inter4,
           CAST(sa.n1 AS BIGINT) AS na1, CAST(sb.n1 AS BIGINT) AS nb1,
           CAST(coalesce(i1.inter1, 0) AS BIGINT) AS inter1,
           {_ratio("coalesce(i4.inter4, 0)", "sa.n4")} AS containment4,
           {_ratio("coalesce(i4.inter4, 0)",
                   "sa.n4 + sb.n4 - coalesce(i4.inter4, 0)")} AS jaccard4,
           {_ratio("coalesce(i1.inter1, 0)", "sa.n1")} AS containment1,
           {_ratio("coalesce(i1.inter1, 0)",
                   "sa.n1 + sb.n1 - coalesce(i1.inter1, 0)")} AS jaccard1
    FROM prs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    LEFT JOIN i4 ON i4.doc_a = p.doc_a
    LEFT JOIN i1 ON i1.doc_a = p.doc_a
    """,
)
def shingle_containment(spark, sf_dir):
    """T81: word + 4-gram-shingle containment/Jaccard per consecutive
    doc pair (module header) — distinct shingle sets, the standard
    shingle equijoin, LEFT join restoring zero-overlap pairs."""
    words = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    sh = words.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {_K} + 1),"
                f" i -> array_join(slice(w, i, {_K}), ' '))"
            )
        ).alias("s"),
    ).distinct()
    dw = words.select("doc_id", F.explode("w").alias("s")).distinct()
    n4 = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n4"))
    n1 = dw.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    sizes = n4.join(n1, "doc_id")
    ids = words.select("doc_id")
    prs = (
        ids.where(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("doc_a"))
        .join(
            ids.select((F.col("doc_id") - 1).alias("doc_a")),
            "doc_a",
            "left_semi",
        )
        .withColumn("doc_b", F.col("doc_a") + 1)
    )

    def inter(dset, name):
        x = dset.where(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("doc_a"), "s"
        )
        y = dset.select((F.col("doc_id") - 1).alias("doc_a"), "s")
        return (
            x.join(y, ["doc_a", "s"])
            .groupBy("doc_a")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    sa = sizes.selectExpr(
        "doc_id AS doc_a", "n4 AS na4", "n1 AS na1"
    )
    sb = sizes.selectExpr(
        "doc_id - 1 AS doc_a", "n4 AS nb4", "n1 AS nb1"
    )
    out = (
        prs.join(sa, "doc_a")
        .join(sb, "doc_a")
        .join(inter(sh, "inter4"), "doc_a", "left")
        .join(inter(dw, "inter1"), "doc_a", "left")
        .na.fill({"inter4": 0, "inter1": 0})
    )
    return out.selectExpr(
        "doc_a",
        "doc_b",
        "na4",
        "nb4",
        "inter4",
        "na1",
        "nb1",
        "inter1",
        f"{_ratio('inter4', 'na4')} AS containment4",
        f"{_ratio('inter4', 'na4 + nb4 - inter4')} AS jaccard4",
        f"{_ratio('inter1', 'na1')} AS containment1",
        f"{_ratio('inter1', 'na1 + nb1 - inter1')} AS jaccard1",
    )
