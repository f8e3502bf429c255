"""MP10 — contrast profile (Mercer, Keogh et al. ICDM'21): the last
Keogh-lab family member the registry was missing — motifs find what
REPEATS, discords what is RARE, the AB join what is SHARED with
another set, FLUSS where regimes change, snippets what is TYPICAL;
the contrast profile finds what is CHARACTERISTIC: subsequences that
repeat within the corpus (small self-join distance) yet have NO
counterpart in the benchmark/other set (large AB distance),

    CP²(i) = max(0, d²_AB(i) − d²_self(i))

— high CP = structure unique to this corpus, the shape you would
mine for class-specific features (or, in curation terms, the novel
repeated boilerplate a benchmark screen would never flag).

Full-value exactness: integer tokens make both profiles exact int64,
so every window's (d²_self, d²_AB, CP²) is hash-checked against the
brute SQL twin — the motif-family convention — over the shared
corpus (first 64 docs at cap 128, m = 8, exclusion 4; the bench side
is mp_ab_profile's 4-series benchmark with its planted overlaps).

Scale shape: both inputs are the PRODUCTION kernels — the self
profile a zero-shuffle blocked-BLAS mapInPandas, the AB profile the
broadcast-small-query-side variant — and the contrast is one
(doc, pos) equi-join of two window-count-sized frames.

Honest (gated) reading: the planted bench overlaps (docs 3 and 7
feed the benchmark verbatim) force CP² = 0 exactly on the planted
runs of those docs — self-repeating AND bench-covered — while the
rest of the corpus carries large CP² (its periodic structure repeats
internally and the 4-series benchmark cannot cover it); both pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import matrixprofile as MP
from dtaidistance_spark.operators.motif_q import (
    _AB,
    _D,
    _EXCL,
    _M,
    _MAXLEN,
    _ab_inputs,
)
from dtaidistance_spark.operators.queries import register


@register(
    "contrast_profile",
    oracle=_AB
    + f"""
    , selfp AS (
      SELECT a.doc_id, a.i AS pos,
             min(list_sum(list_transform(range({_M}),
               k -> (a.w[k + 1] - b.w[k + 1])
                    * (a.w[k + 1] - b.w[k + 1])))) AS d2_self
      FROM cw a JOIN cw b
        ON a.doc_id = b.doc_id AND abs(a.i - b.i) > {_EXCL}
      GROUP BY a.doc_id, a.i
    ),
    abp AS (
      SELECT doc_id, pos, d2 AS d2_ab FROM abprof WHERE rn = 1
    )
    SELECT s.doc_id, CAST(s.pos AS INT) AS pos,
           CAST(s.d2_self AS BIGINT) AS d2_self,
           CAST(a.d2_ab AS BIGINT) AS d2_ab,
           CAST(greatest(0, a.d2_ab - s.d2_self) AS BIGINT) AS cp2
    FROM selfp s JOIN abp a
      ON a.doc_id = s.doc_id AND a.pos = s.pos
    """,
)
def contrast_profile(spark, sf_dir):
    """MP10: full-value contrast profile over the shared AB corpus
    (module header) — production self + AB kernels, one (doc, pos)
    equi-join, exact int64 CP²."""
    corpus, bench = _ab_inputs(spark)
    selfp = MP.matrix_profile(
        corpus, m=_M, excl=_EXCL, max_len=_MAXLEN
    ).select(
        "doc_id", "pos", F.col("d2").alias("d2_self")
    )
    abp = MP.matrix_profile_ab(corpus, bench, m=_M).select(
        "doc_id", "pos", F.col("d2").alias("d2_ab")
    )
    return (
        selfp.join(abp, ["doc_id", "pos"])
        .selectExpr(
            "doc_id",
            "CAST(pos AS INT) AS pos",
            "CAST(d2_self AS BIGINT) AS d2_self",
            "CAST(d2_ab AS BIGINT) AS d2_ab",
            "CAST(greatest(0, d2_ab - d2_self) AS BIGINT) AS cp2",
        )
    )
