"""Registry queries for the matrix-profile operator — FULL-VALUE
DuckDB-oracled (the same exactness trick as ``diag_q``: integer tokens
make every squared-Euclidean subsequence distance an exact int64, so
the brute-force O(q^2 m) SQL twin reproduces the production kernel's
output bit-for-bit, including the argmin tie rule ORDER BY (d2, j) ==
numpy first-occurrence argmin).

Corpus: the first 48 synthetic docs truncated to 128 tokens (the truncation
keeps the SQL twin's pair join at ~700k rows); m=8, exclusion zone 4.
The Spark side is the PRODUCTION ``matrixprofile.matrix_profile``
operator — blocked BLAS kernel, mapInPandas, zero shuffles — only the
corpus is small, no code path is swapped.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators import matrixprofile as MP
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N_DOCS = 48
_MAXLEN = 128
_M = 8
_EXCL = 4

# brute-force profile CTE over the re-derived synthetic table:
# windows -> within-doc pair join outside the exclusion zone -> exact
# integer d2 -> rank-1 neighbor per (doc, pos)
_BRUTE = synth_sql(_N_DOCS) + f"""
, trunc AS (
  SELECT doc_id,
         list_slice(tokens, 1, least(n_tok, {_MAXLEN})) AS t,
         least(n_tok, {_MAXLEN}) AS n
  FROM synth
),
winx AS (
  SELECT doc_id, unnest(range(n - {_M} + 1)) AS i, t
  FROM trunc
),
wins AS (
  SELECT doc_id, i, list_slice(t, i + 1, i + {_M}) AS w
  FROM winx
),
pd2 AS (
  SELECT a.doc_id, a.i AS pos, b.i AS j,
         list_sum(list_transform(range({_M}),
           k -> (a.w[k + 1] - b.w[k + 1]) * (a.w[k + 1] - b.w[k + 1])
         )) AS d2
  FROM wins a JOIN wins b
    ON a.doc_id = b.doc_id AND abs(a.i - b.i) > {_EXCL}
),
prof AS (
  SELECT doc_id, pos, j, d2,
         row_number() OVER (PARTITION BY doc_id, pos ORDER BY d2, j) AS rn
  FROM pd2
)
"""


def _profile_df(spark):
    seqs = synth.sequences_df(spark, _N_DOCS).withColumn(
        "tokens", F.slice("tokens", 1, _MAXLEN)
    )
    return MP.matrix_profile(seqs, m=_M, excl=_EXCL)


@register(
    "matrix_profile_self",
    oracle=_BRUTE
    + """
    SELECT doc_id, pos::INT AS pos, j::INT AS nn_pos, d2::BIGINT AS d2
    FROM prof WHERE rn = 1
    """,
)
def matrix_profile_self(spark, sf_dir):
    """Full per-position matrix profile of 48 series (~5.8k rows), every
    (nearest-neighbor position, distance) pair hash-checked against the
    brute-force SQL twin."""
    return _profile_df(spark)


@register(
    "matrix_profile_motifs",
    oracle=_BRUTE
    + """
    , mp AS (SELECT doc_id, pos, j, d2 FROM prof WHERE rn = 1),
    ranked AS (
      SELECT doc_id, pos, j, d2,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2, pos)
               AS r_motif,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2 DESC, pos)
               AS r_discord
      FROM mp
    )
    SELECT mo.doc_id,
           mo.pos::INT AS motif_pos, mo.j::INT AS motif_nn,
           mo.d2::BIGINT AS motif_d2,
           di.pos::INT AS discord_pos, di.d2::BIGINT AS discord_d2
    FROM ranked mo
    JOIN ranked di ON mo.doc_id = di.doc_id
    WHERE mo.r_motif = 1 AND di.r_discord = 1
    """,
)
def matrix_profile_motifs(spark, sf_dir):
    """Downstream analytics over the profile: per series the best motif
    pair (global profile argmin; ties -> smallest pos, and its stored
    neighbor) and the top discord (profile argmax — the anomaly
    primitive). One row per doc, fully oracled."""
    mp = _profile_df(spark)
    w_motif = Window.partitionBy("doc_id").orderBy("d2", "pos")
    w_disc = Window.partitionBy("doc_id").orderBy(F.desc("d2"), F.asc("pos"))
    ranked = mp.select(
        "doc_id",
        "pos",
        "nn_pos",
        "d2",
        F.row_number().over(w_motif).alias("r_motif"),
        F.row_number().over(w_disc).alias("r_discord"),
    )
    mo = ranked.where(F.col("r_motif") == 1).select(
        "doc_id",
        F.col("pos").alias("motif_pos"),
        F.col("nn_pos").alias("motif_nn"),
        F.col("d2").alias("motif_d2"),
    )
    di = ranked.where(F.col("r_discord") == 1).select(
        "doc_id",
        F.col("pos").alias("discord_pos"),
        F.col("d2").alias("discord_d2"),
    )
    return mo.join(di, "doc_id")
