"""T93 — Reciprocal Rank Fusion of two retrieval lanes (Cormack–
Clarke–Büttcher SIGIR'09; Dirichlet query-likelihood per Zhai–
Lafferty SIGIR'01; BM25 per Robertson/Okapi): the standard
hybrid-search primitive — production retrieval fuses a lexical
lane and a second lane not by calibrating their incomparable
scores but by discarding them entirely:

    RRF(d) = Σ_lanes 1/(60 + rank_lane(d))

rank-only fusion is invariant to any monotone rescaling of either
lane's scores (gated), which is the whole point: BM25 logits and
LM log-likelihoods share no scale, ranks always do.

Lanes (same fixed query terms as T25, ("table", "merge",
"window"), over ``documents``):
  lane A — BM25 (k1 = 1.2, b = 0.75), zero-match docs tied at 0;
  lane B — Dirichlet-smoothed query likelihood (μ = 2000):
           Σ_q ln((tf + μ·p_c(q))/(dl + μ)) — scores EVERY doc.
Both lanes rank ALL docs (ties by doc_id — pinned), RRF fuses the
full rankings, top-20 fused rows emitted with both lane ranks
visible.

Exactness: tf/df/dl INT64; each lane score one float tree;
rankings integer row_numbers with pinned tie-breaks; RRF a sum of
TWO exact rationals per doc evaluated in fixed order, floor-1e6.

Honest (gated) reading — measured: the lanes agree strongly but
not identically — 12 of the fused top-20 sit in BOTH lanes'
top-20, and the fused WINNER is doc 394 at ranks (3, 1), beating
doc 289 at (1, 4): 1/63 + 1/61 > 1/61 + 1/64 — RRF preferring
consistently-high over single-lane-first, its defining behavior,
here decided by the third decimal of the harmonic sum.  Four docs
are RESCUED into the fused list from BM25 ranks 21–29 by QL
ranks 3–13 (doc 98: 21 → fused 6), the length-treatment
difference (b = 0.75 saturation vs μ = 2000 smoothing) made
visible row by row — a doc strong in ANY lane survives fusion.
Gates: monotone-invariance (cubing lane scores changes nothing);
the top-in-both dominance property; the 1/(60+r) hand arithmetic;
numpy recompute of both lanes + the fusion on raw text; the
corpus overlap + winner + rescued-docs pins.

Scale shape: one token-explode exchange per lane (shared scan),
partitioned ranking windows... the lane rankings are global-ORDER
rankings over ≤ n_docs scored rows after a map-side-combined
aggregate — the T25 posture — and the fusion is a 2-way join on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_TERMS = ("table", "merge", "window")
_K1, _B = 1.2, 0.75
_MU = 2000.0
_RRFK = 60
_TOPK = 20

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _oracle() -> str:
    terms = "(" + ", ".join(f"'{t}'" for t in _TERMS) + ")"
    return f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS coll_len,
             sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl
    ),
    tok AS (SELECT doc_id, unnest(ws) AS tok FROM d),
    ctf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS ctf FROM tok
      WHERE tok IN {terms} GROUP BY tok
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok
      WHERE tok IN {terms} GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf GROUP BY tok
    ),
    bm AS (
      SELECT dl.doc_id,
             COALESCE(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B}
                  + {_B} * dl.dl / stats.avgdl))
             ), 0.0) AS s_bm
      FROM dl CROSS JOIN stats
      LEFT JOIN tf ON tf.doc_id = dl.doc_id
      LEFT JOIN df ON df.tok = tf.tok
      GROUP BY dl.doc_id
    ),
    ql AS (
      SELECT dl.doc_id,
             sum(
               ln((COALESCE(tf.tf, 0) + {_MU} * ctf.ctf
                   / stats.coll_len)
                  / (dl.dl + {_MU}))
             ) AS s_ql
      FROM dl CROSS JOIN stats
      CROSS JOIN ctf
      LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.tok = ctf.tok
      GROUP BY dl.doc_id
    ),
    ranked AS (
      SELECT bm.doc_id,
             row_number() OVER (ORDER BY round(bm.s_bm, 6) DESC,
                                bm.doc_id) AS r_bm,
             row_number() OVER (ORDER BY round(ql.s_ql, 6) DESC,
                                ql.doc_id) AS r_ql
      FROM bm JOIN ql ON ql.doc_id = bm.doc_id
    ),
    fused AS (
      SELECT doc_id, r_bm, r_ql,
             1.0 / ({_RRFK} + r_bm) + 1.0 / ({_RRFK} + r_ql) AS s
      FROM ranked
    )
    SELECT doc_id,
           CAST(r_bm AS BIGINT) AS rank_bm25,
           CAST(r_ql AS BIGINT) AS rank_ql,
           {_F6.format(x="s")} AS rrf_score,
           CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT)
             AS rank_fused
    FROM fused
    QUALIFY rank_fused <= {_TOPK}
    """


@register("rrf_hybrid_retrieval", oracle=_oracle())
def rrf_hybrid_retrieval(spark, sf_dir):
    """T93: RRF fusion of the BM25 and Dirichlet-QL lanes for the
    T25 query (module header) — INT64 term stats, pinned rankings,
    1/(60+r) fusion, floor-1e6."""
    terms_arr = "array(" + ", ".join(f"'{t}'" for t in _TERMS) + ")"
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr("split(text, ' ')").alias("ws")
    )
    dl = d.select(
        "doc_id", F.expr("CAST(size(ws) AS BIGINT)").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("coll_len"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tok = d.select(
        "doc_id", F.explode("ws").alias("tok")
    ).where(F.expr(f"array_contains({terms_arr}, tok)"))
    ctf = tok.groupBy("tok").agg(
        F.count("*").cast("long").alias("ctf")
    )
    tf = tok.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("tf")
    )
    df = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    bm = (
        dl.crossJoin(F.broadcast(stats))
        .join(tf, "doc_id", "left")
        .join(F.broadcast(df), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        f"ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
                        f" * tf * ({_K1} + 1.0)"
                        f" / (tf + {_K1} * (1.0 - {_B}"
                        f" + {_B} * dl / avgdl))"
                    )
                ),
                F.lit(0.0),
            ).alias("s_bm")
        )
    )
    # left join tf on (doc_id, tok) against the doc × term spine
    spine = dl.crossJoin(F.broadcast(stats)).crossJoin(
        F.broadcast(ctf)
    )
    ql = (
        spine.join(tf, ["doc_id", "tok"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    f"ln((COALESCE(tf, 0) + {_MU} * ctf / coll_len)"
                    f" / (dl + {_MU}))"
                )
            ).alias("s_ql")
        )
    )
    from dtaidistance_spark.operators.qutil import global_topk

    joined = bm.join(ql, "doc_id")
    # full lane rankings via the zero-Window global_topk machinery
    # (k = all rows: TakeOrderedAndProject + one sort_array fold)
    # cap must exceed any sf's doc count but stay heap-allocatable:
    # TakeOrdered builds a bounded k-entry priority queue per partition
    n_all = 100_000
    r_bm = global_topk(
        joined.select("doc_id", F.expr("round(s_bm, 6)").alias("sb")),
        [(F.col("sb"), True), (F.col("doc_id"), False)],
        n_all,
        rank_col="r_bm",
    ).select("doc_id", "r_bm")
    r_ql = global_topk(
        joined.select("doc_id", F.expr("round(s_ql, 6)").alias("sq")),
        [(F.col("sq"), True), (F.col("doc_id"), False)],
        n_all,
        rank_col="r_ql",
    ).select("doc_id", "r_ql")
    fused = r_bm.join(r_ql, "doc_id").select(
        "doc_id",
        "r_bm",
        "r_ql",
        F.expr(
            f"1.0 / ({_RRFK} + r_bm) + 1.0 / ({_RRFK} + r_ql)"
        ).alias("s"),
    )
    top = global_topk(
        fused,
        [(F.col("s"), True), (F.col("doc_id"), False)],
        _TOPK,
        rank_col="rank_fused",
    )
    return top.select(
        "doc_id",
        F.col("r_bm").cast("long").alias("rank_bm25"),
        F.col("r_ql").cast("long").alias("rank_ql"),
        F.expr(_F6.format(x="s")).alias("rrf_score"),
        F.col("rank_fused").cast("int").alias("rank_fused"),
    )
