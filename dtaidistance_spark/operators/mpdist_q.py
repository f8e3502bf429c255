"""MP8 — MPdist (Gharghabi et al. ICDM'18): the matrix-profile-based
distance between SERIES — the k-th smallest value of the concatenated
AB/BA join profiles (each window's nearest-neighbor distance on the
other series).  MPdist is the distance the MP community uses where
whole-series DTW/Euclidean fail: it counts two series similar if they
SHARE enough similar subsequences, regardless of alignment or length.

Exactness: profiles are RAW squared Euclidean over int64 tokens (the
mp_ab_profile precedent — every d2 is an integer), and the k-th
smallest VALUE of an int64 multiset is tie-free by definition — so
``mpdist2`` is bit-exact with no float anywhere (the z-normalized
variant is the matrix_profile_znorm family's tier; raw-d2 is this
corpus's exact tier).  k = ⌈0.05·(q_a + q_b)⌉ per the paper's 5%
convention, over the 2-sided profile multiset.

Scale shape: all 120 unordered pairs of the 16-doc sample ride ONE
self-join (a < b) whose build side is 16 rows — broadcast; the kernel
is one blocked-BLAS distance matrix per pair inside ``mapInPandas``
(row mins = P_AB, col mins = P_BA, one np.partition for the k-th
value), zero further shuffles.  At corpus scale the pair table comes
from the dtw_pairs length-bucket machinery; the kernel is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 16  # docs in the pair sample
_CAP = 128  # token cap per series
_M = 8  # window length

_OUT = (
    "doc_a string, doc_b string, q2 long, k long, mpdist2 long"
)


def _kernel(batches):
    for pdf in batches:
        rows = []
        for da, va, db, vb in zip(
            pdf["doc_a"], pdf["va"], pdf["doc_b"], pdf["vb"]
        ):
            a = np.asarray(va, dtype=np.int64)
            b = np.asarray(vb, dtype=np.int64)
            Wa = np.lib.stride_tricks.sliding_window_view(a, _M).astype(
                np.float64
            )
            Wb = np.lib.stride_tricks.sliding_window_view(b, _M).astype(
                np.float64
            )
            Sa = np.einsum("ij,ij->i", Wa, Wa)
            Sb = np.einsum("ij,ij->i", Wb, Wb)
            D = Sa[:, None] + Sb[None, :] - 2.0 * (Wa @ Wb.T)
            # integer-valued doubles (tokens < 2^17, m = 8 ⇒ d2 < 2^37)
            pab = D.min(axis=1)
            pba = D.min(axis=0)
            allp = np.concatenate([pab, pba]).astype(np.int64)
            q2 = allp.size
            k = (q2 + 19) // 20
            mp = int(np.partition(allp, k - 1)[k - 1])
            rows.append((da, db, q2, k, mp))
        if rows:
            yield pd.DataFrame(
                rows, columns=["doc_a", "doc_b", "q2", "k", "mpdist2"]
            )


@register(
    "mpdist_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    win AS (
      SELECT doc_id, t.j AS pos,
             list_slice(v, t.j + 1, t.j + {_M}) AS w
      FROM docs, unnest(range(len(v) - {_M} + 1)) AS t(j)
    ),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    ),
    crossed AS (
      SELECT p.da, p.db, wa.pos AS pa, wb.pos AS pb,
             list_reduce(list_transform(range({_M}), k ->
               (wa.w[k + 1] - wb.w[k + 1])
               * (wa.w[k + 1] - wb.w[k + 1])), (x, y) -> x + y) AS d2
      FROM pairs p
      JOIN win wa ON wa.doc_id = p.da
      JOIN win wb ON wb.doc_id = p.db
    ),
    pab AS (
      SELECT da, db, pa AS pos, min(d2) AS d2
      FROM crossed GROUP BY 1, 2, 3
    ),
    pba AS (
      SELECT da, db, pb AS pos, min(d2) AS d2
      FROM crossed GROUP BY 1, 2, pb
    ),
    allp AS (
      SELECT da, db, 0 AS side, pos, d2 FROM pab
      UNION ALL
      SELECT da, db, 1 AS side, pos, d2 FROM pba
    ),
    cnt AS (
      SELECT da, db, CAST(count(*) AS BIGINT) AS q2 FROM allp
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT allp.*, row_number() OVER (
        PARTITION BY da, db ORDER BY d2, side, pos) AS rn
      FROM allp
    )
    SELECT rk.da AS doc_a, rk.db AS doc_b, cnt.q2,
           CAST((cnt.q2 + 19) // 20 AS BIGINT) AS k,
           CAST(rk.d2 AS BIGINT) AS mpdist2
    FROM rk JOIN cnt ON cnt.da = rk.da AND cnt.db = rk.db
    WHERE rk.rn = (cnt.q2 + 19) // 20
    """,
)
def mpdist_pairs(spark, sf_dir):
    """MP8: MPdist between all 120 pairs of the 16-doc sample (module
    header) — raw-d2 profiles keep the k-th-smallest statistic int64
    and tie-free; one broadcast self-join + one BLAS kernel per pair
    inside mapInPandas, zero further shuffles."""
    docs = (
        synth.sequences_df(spark, _ND)
        .select(
            "doc_id",
            F.expr(
                f"transform(slice(tokens, 1, {_CAP}),"
                f" x -> CAST(x AS BIGINT))"
            ).alias("v"),
        )
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("v").alias("va")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("v").alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    return pairs.mapInPandas(_kernel, _OUT)
