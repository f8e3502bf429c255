"""MP9 — time-series snippets (Imani, Madrid, Keogh et al. ICDM'18):
per series, the two length-64 blocks that best REPRESENT it — the
greedy minimum-coverage-area selection over MPdist-style profiles
that answers "show me typical behavior" (motifs show repeated
behavior, discords show anomalous behavior; snippets show
REPRESENTATIVE behavior — the third leg of the Keogh-lab triad, and
what a rollup UI shows for a 10⁹-point series).

Exactness: raw squared-Euclidean window distances keep every profile
value INTEGER (the mp_ab_profile/MPdist precedent), so the per-
candidate coverage areas Σᵢ minⱼ d², the greedy argmins (ties to the
smaller block index, declared), and the second-pick joint areas are
all int64-exact; the only float is the coverage fraction (floor-1e6).

Per doc (first 256 tokens, m = 8): 4 candidate blocks of 64, each
contributing its 57 windows; profile dᶜ(i) = min over candidate
windows of d²(wᵢ, wⱼ); pick1 = argmin Σ dᶜ, pick2 = argmin of the
joint Σ min(d^pick1, dᶜ) over the remaining blocks; frac1 = fraction
of windows whose nearer snippet is pick1 (ties to pick1).

Scale shape: one zero-shuffle ``mapInPandas`` blocked-BLAS kernel per
series (the MP family plan) — 1.8M window pairs per 32-doc batch; at
corpus scale each series is independent map work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 32
_CAP = 256
_M = 8
_B = 64  # block length
_NB = _CAP // _B

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_OUT = (
    "doc_id string, snip1 long, area1 long, snip2 long, area2 long,"
    " n_win long, frac1 double"
)


def _kernel(batches):
    for pdf in batches:
        rows = []
        for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
            a = np.asarray(toks[:_CAP], dtype=np.int64)
            W = np.lib.stride_tricks.sliding_window_view(a, _M).astype(
                np.float64
            )
            q = W.shape[0]
            S = np.einsum("ij,ij->i", W, W)
            profs = {}
            for c in range(_NB):
                lo = c * _B
                if lo >= q:  # short series: block has no window
                    continue
                hi = min(lo + _B - _M + 1, q)
                Wc = W[lo:hi]
                Sc = S[lo:hi]
                D = S[:, None] + Sc[None, :] - 2.0 * (W @ Wc.T)
                profs[c] = D.min(axis=1).astype(np.int64)
            areas = {c: int(p.sum()) for c, p in profs.items()}
            p1 = min(areas, key=lambda c: (areas[c], c))
            joint = {
                c: int(np.minimum(profs[p1], profs[c]).sum())
                for c in profs
                if c != p1
            }
            p2 = min(joint, key=lambda c: (joint[c], c))
            # nearer-snippet fraction (ties to pick1)
            n1 = int((profs[p1] <= profs[p2]).sum())
            rows.append(
                (
                    doc_id,
                    p1,
                    areas[p1],
                    p2,
                    joint[p2],
                    q,
                    float(n1) / q,
                )
            )
        if rows:
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "snip1",
                    "area1",
                    "snip2",
                    "area2",
                    "n_win",
                    "frac1",
                ],
            )
            out["frac1"] = np.floor(out["frac1"] * 1e6 + 0.5) / 1e6
            yield out


@register(
    "snippet_selection",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth WHERE n_tok >= {_B * 2 + _M}
    ),
    win AS MATERIALIZED (
      SELECT doc_id, t.j AS i, list_slice(v, t.j + 1, t.j + {_M}) AS w
      FROM docs, unnest(range(len(v) - {_M} + 1)) AS t(j)
    ),
    cwin AS MATERIALIZED (
      SELECT doc_id, i // {_B} AS c, i, w FROM win
      WHERE i % {_B} <= {_B - _M}
    ),
    d AS (
      SELECT a.doc_id, b.c, a.i,
             min(list_reduce(list_transform(range({_M}), k ->
               (a.w[k + 1] - b.w[k + 1]) * (a.w[k + 1] - b.w[k + 1])),
               (x, y) -> x + y)) AS dmin
      FROM win a JOIN cwin b ON b.doc_id = a.doc_id
      GROUP BY a.doc_id, b.c, a.i
    ),
    areas AS (
      SELECT doc_id, c, CAST(sum(dmin) AS BIGINT) AS area
      FROM d GROUP BY doc_id, c
    ),
    p1 AS (
      SELECT doc_id, c AS snip1, area AS area1
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY area, c) AS rn FROM areas)
      WHERE rn = 1
    ),
    joint AS (
      SELECT d.doc_id, d.c,
             CAST(sum(least(d.dmin, d1.dmin)) AS BIGINT) AS jarea
      FROM d
      JOIN p1 ON p1.doc_id = d.doc_id
      JOIN d d1 ON d1.doc_id = d.doc_id AND d1.c = p1.snip1
               AND d1.i = d.i
      WHERE d.c != p1.snip1
      GROUP BY d.doc_id, d.c
    ),
    p2 AS (
      SELECT doc_id, c AS snip2, jarea AS area2
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY jarea, c) AS rn FROM joint)
      WHERE rn = 1
    ),
    fr AS (
      SELECT d.doc_id,
             CAST(count(*) AS BIGINT) AS n_win,
             CAST(sum(CASE WHEN d1.dmin <= d2.dmin THEN 1 ELSE 0 END)
               AS BIGINT) AS n1
      FROM (SELECT DISTINCT doc_id, i FROM d) d
      JOIN p1 ON p1.doc_id = d.doc_id
      JOIN p2 ON p2.doc_id = d.doc_id
      JOIN d d1 ON d1.doc_id = d.doc_id AND d1.c = p1.snip1
               AND d1.i = d.i
      JOIN d d2 ON d2.doc_id = d.doc_id AND d2.c = p2.snip2
               AND d2.i = d.i
      GROUP BY d.doc_id
    )
    SELECT p1.doc_id, CAST(p1.snip1 AS BIGINT) AS snip1, p1.area1,
           CAST(p2.snip2 AS BIGINT) AS snip2, p2.area2,
           fr.n_win,
           {_F6.format(
               x="CAST(fr.n1 AS DOUBLE) / CAST(fr.n_win AS DOUBLE)")}
             AS frac1
    FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
    JOIN fr ON fr.doc_id = p1.doc_id
    """,
)
def snippet_selection(spark, sf_dir):
    """MP9: two-snippet greedy selection per series (module header) —
    integer profiles/areas, deterministic argmins, zero-shuffle
    mapInPandas BLAS kernel."""
    # precondition (declared): snippets need >= 2 candidate blocks
    docs = (
        synth.sequences_df(spark, _ND)
        .where(F.col("n_tok") >= _B * 2 + _M)
        .select("doc_id", "tokens")
    )
    return docs.mapInPandas(_kernel, _OUT)
