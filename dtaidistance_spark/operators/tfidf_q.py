"""T61 — TF-IDF cosine similarity top-k document pairs (Salton's
vector-space model — the classic IR pairwise-similarity screen next
to BM25's query-ranking and the MinHash/SimHash dedup stack: those
find NEAR-DUPLICATES; TF-IDF cosine finds TOPICALLY similar docs).

Exactness design: tokens fold mod 512 and each doc's first 512 tokens
form a DENSE tf vector (one scan-side HOF count per fold), so the
cosine numerator/norms are folds over the FIXED fold axis 0..511 —
order-pinned float accumulation, engine-identical (the Goertzel
precedent).  idf_j = ln(N/df_j) rides one broadcast 512-double array
built with an order-pinned collect (the NB-classifier precedent); df
counts are int64.  Cosines are floored 1e6 BEFORE ranking (the BM25
precedent) with (cos DESC, doc_a, doc_b) ties, and the top-64 is a
TakeOrderedAndProject.

Scale shape: per-doc tf vectors are scan-side HOFs (zero exchanges);
df is one map-side-combined explode count; the pair stage is a
broadcast self-join (a < b) over the 128-doc sample — at corpus scale
the pair enumeration hands off to the LSH/ANN candidate machinery
(T2/T8+) and this kernel scores the candidates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128
_MOD = 512
_CAP = 512
_TOPK = 64

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _tfv(eng: str) -> str:
    if eng == "spark":
        return (
            f"transform(sequence(0, {_MOD} - 1), j -> CAST(size(filter("
            f"slice(tokens, 1, {_CAP}), t -> t % {_MOD} = j))"
            f" AS BIGINT))"
        )
    return (
        f"list_transform(range({_MOD}), j -> CAST(len(list_filter("
        f"list_slice(tokens, 1, {_CAP}), t -> t % {_MOD} = j))"
        f" AS BIGINT))"
    )


def _dot(eng: str) -> str:
    """Order-pinned Σ_j tfa[j]·tfb[j]·idf[j]² over the fold axis."""
    if eng == "spark":
        return (
            f"aggregate(sequence(0, {_MOD} - 1), CAST(0 AS DOUBLE),"
            f" (a, j) -> a + CAST(element_at(tfa, j + 1)"
            f" * element_at(tfb, j + 1) AS DOUBLE)"
            f" * element_at(idf, j + 1) * element_at(idf, j + 1))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range({_MOD}), j ->"
        f" CAST(tfa[j + 1] * tfb[j + 1] AS DOUBLE)"
        f" * idf[j + 1] * idf[j + 1])), (a, x) -> a + x)"
    )


def _nrm(eng: str, tf: str) -> str:
    """Order-pinned Σ_j (tf[j]·idf[j])² over the fold axis."""
    if eng == "spark":
        return (
            f"aggregate(sequence(0, {_MOD} - 1), CAST(0 AS DOUBLE),"
            f" (a, j) -> a + CAST(element_at({tf}, j + 1)"
            f" * element_at({tf}, j + 1) AS DOUBLE)"
            f" * element_at(idf, j + 1) * element_at(idf, j + 1))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range({_MOD}), j ->"
        f" CAST({tf}[j + 1] * {tf}[j + 1] AS DOUBLE)"
        f" * idf[j + 1] * idf[j + 1])), (a, x) -> a + x)"
    )


_COS = (
    "CASE WHEN na > CAST(0 AS DOUBLE) AND nb > CAST(0 AS DOUBLE)"
    " THEN dot / (sqrt(na) * sqrt(nb)) ELSE CAST(0 AS DOUBLE) END"
)

_IDF_TREE = (
    f"ln(CAST({_ND} AS DOUBLE) / CAST(df AS DOUBLE))"
)


@register(
    "tfidf_cosine_topk",
    oracle=synth_sql(_ND)
    + f"""
    , tfv AS MATERIALIZED (
      SELECT doc_id, {_tfv('duck')} AS tf FROM synth
    ),
    sparse AS (
      SELECT doc_id, t.j AS j, tf[t.j + 1] AS c
      FROM tfv, unnest(range({_MOD})) AS t(j)
      WHERE tf[t.j + 1] > 0
    ),
    dfc AS (
      SELECT j, CAST(count(*) AS BIGINT) AS df FROM sparse GROUP BY j
    ),
    axis AS (SELECT unnest(range({_MOD})) AS j),
    idfd AS (
      SELECT a.j,
             CASE WHEN d.df IS NULL THEN CAST(0 AS DOUBLE)
                  ELSE {_IDF_TREE} END AS w
      FROM axis a LEFT JOIN dfc d ON d.j = a.j
    ),
    idfa AS (SELECT list(w ORDER BY j) AS idf FROM idfd),
    nrm AS MATERIALIZED (
      SELECT doc_id, tf, {_nrm('duck', 'tf')} AS nn
      FROM tfv, idfa
    ),
    prs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.tf AS tfa, b.tf AS tfb, a.nn AS na, b.nn AS nb
      FROM nrm a JOIN nrm b ON a.doc_id < b.doc_id
    ),
    dots AS (
      SELECT doc_a, doc_b, na, nb, {_dot('duck')} AS dot
      FROM prs, idfa
    ),
    cosed AS (
      SELECT doc_a, doc_b, {_FLOOR6.format(x=_COS)} AS cosine
      FROM dots
    )
    SELECT doc_a, doc_b, cosine
    FROM cosed ORDER BY cosine DESC, doc_a, doc_b LIMIT {_TOPK}
    """,
)
def tfidf_cosine_topk(spark, sf_dir):
    """T61: TF-IDF cosine top-{_TOPK} doc pairs (module header) —
    dense fold-512 tf vectors scan-side, idf as one broadcast
    512-double array, order-pinned dot/norm folds, cosines floored
    BEFORE ranking, TakeOrderedAndProject top-k."""
    docs = synth.sequences_df(spark, _ND).select("doc_id", "tokens")
    tfv = docs.select("doc_id", F.expr(_tfv("spark")).alias("tf"))
    sparse = tfv.select(
        "doc_id",
        F.posexplode("tf").alias("j0", "c"),
    ).where(F.col("c") > 0)
    dfc = sparse.groupBy(F.col("j0").alias("j")).agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    axis = spark.range(_MOD).select(F.col("id").cast("long").alias("j"))
    idfd = axis.join(F.broadcast(dfc), "j", "left").select(
        "j",
        F.expr(
            f"CASE WHEN df IS NULL THEN CAST(0 AS DOUBLE)"
            f" ELSE {_IDF_TREE} END"
        ).alias("w"),
    )
    idfa = idfd.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, w AS ww))),"
            " z -> z.ww)"
        ).alias("idf")
    )
    nrm = tfv.crossJoin(F.broadcast(idfa)).select(
        "doc_id", "tf", F.expr(_nrm("spark", "tf")).alias("nn")
    )
    a = nrm.select(
        F.col("doc_id").alias("doc_a"),
        F.col("tf").alias("tfa"),
        F.col("nn").alias("na"),
    )
    b = nrm.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tf").alias("tfb"),
        F.col("nn").alias("nb"),
    )
    prs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    dots = prs.crossJoin(F.broadcast(idfa)).select(
        "doc_a", "doc_b", "na", "nb", F.expr(_dot("spark")).alias("dot")
    )
    cosed = dots.select(
        "doc_a",
        "doc_b",
        F.expr(_FLOOR6.format(x=_COS)).alias("cosine"),
    )
    return (
        cosed.orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(_TOPK)
    )
