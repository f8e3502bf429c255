"""T56 — corpus-trained quality classifier (the fastText/CCNet recipe
shape): train a text classifier on labeled exemplars, then score the
whole corpus with it — the standard "model-based quality filter" stage
of a training-data pipeline (GPT-3 App. A, CCNet §4.3 use a linear
classifier; multinomial Naive Bayes is the equally-classic choice and
is EXACTLY reproducible, which a GD-trained logistic model is not:
its weights are logs of integer count ratios, so both engines derive
bit-identical models).

In-engine supervised setup (no external data): class 1 = the first 256
synthetic docs ("natural" modular-ramp text); class 0 = their
support-collapsed twins (every token rounded down to a multiple of 4
— the vocabulary-support collapse that template spam / mojibake /
boilerplate exhibits, concentrating all mass on 16 of the 64 folds;
note a PER-DOC pathology like repetition is invisible to global fold
counts — that one is T14b's job).  Docs 0..191 of each class train;
192..255 of each class are HELD OUT and scored.

The three-stage plan IS the 100 TB story:

1. **Train** — per-(label, fold-64) token counts: one explode + ONE
   map-side-combined aggregate → 128 rows total, regardless of corpus
   size.  All int64.
2. **Model** — Laplace-smoothed log-likelihood weights
   ``w_j = ln((c1_j+1)/(N1+64)) − ln((c0_j+1)/(N0+64))`` on the dense
   fold axis (sequence 0..63 left-joined so zero-count folds get the
   smoothing mass) — a 64-double array built with an order-pinned
   collect, broadcast back as ONE row.
3. **Score** — per held-out doc, ``score = Σ_i w[t_i mod 64]`` — a
   single order-pinned left fold over the token array (the kalman
   list_reduce precedent), so the float accumulation sequence is
   engine-identical.  No per-doc feature vector is ever materialized.

Score floor-1e6; label/pred int64.  The planted collapse concentrates
twin mass on 16 of 64 folds while originals spread over all 64, so the
classifier separates the held-out set perfectly — asserted in pytest,
not assumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_NDOC = 256  # originals; twins double it
_NTRAIN = 192  # per class
_D = 64  # fold dimension

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# w_j tree shared verbatim by both engines (c1/c0/n1/n0 int64 columns)
_W_TREE = (
    f"ln((CAST(c1 AS DOUBLE) + CAST(1 AS DOUBLE))"
    f" / (CAST(n1 AS DOUBLE) + CAST({_D} AS DOUBLE)))"
    f" - ln((CAST(c0 AS DOUBLE) + CAST(1 AS DOUBLE))"
    f" / (CAST(n0 AS DOUBLE) + CAST({_D} AS DOUBLE)))"
)


@register(
    "nb_quality_classifier",
    oracle=synth_sql(_NDOC)
    + f"""
    , corpus AS (
      SELECT doc_id, CAST(1 AS BIGINT) AS label, n_tok, tokens
      FROM synth
      UNION ALL
      SELECT doc_id || '_deg' AS doc_id, CAST(0 AS BIGINT) AS label,
             n_tok,
             list_transform(tokens, t -> t - (t % 4)) AS tokens
      FROM synth
    ),
    split AS (
      SELECT doc_id, label, n_tok, tokens,
             CASE WHEN CAST(substr(doc_id, 4, 12) AS BIGINT) < {_NTRAIN}
                  THEN 1 ELSE 0 END AS is_train
      FROM corpus
    ),
    folds AS (
      SELECT label, unnest(list_transform(tokens,
               t -> CAST(t % {_D} AS BIGINT))) AS fold
      FROM split WHERE is_train = 1
    ),
    cnts AS (
      SELECT label, fold, CAST(count(*) AS BIGINT) AS c
      FROM folds GROUP BY label, fold
    ),
    axis AS (SELECT unnest(range({_D})) AS fold),
    dense AS (
      SELECT a.fold,
             coalesce((SELECT c FROM cnts WHERE label = 1
                       AND cnts.fold = a.fold), 0) AS c1,
             coalesce((SELECT c FROM cnts WHERE label = 0
                       AND cnts.fold = a.fold), 0) AS c0
      FROM axis a
    ),
    tot AS (
      SELECT sum(c1) AS n1, sum(c0) AS n0 FROM dense
    ),
    model AS (
      SELECT list({_W_TREE} ORDER BY fold) AS w
      FROM dense, tot
    ),
    scored AS (
      SELECT s.doc_id, s.label, s.n_tok,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(s.tokens,
                   t -> m.w[CAST(t % {_D} AS BIGINT) + 1])),
               (a, x) -> a + x) AS score_raw
      FROM split s, model m
      WHERE s.is_train = 0
    )
    SELECT doc_id, label, n_tok,
           {_FLOOR6.format(x="score_raw")} AS score,
           CAST(CASE WHEN score_raw > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS pred
    FROM scored
    """,
)
def nb_quality_classifier(spark, sf_dir):
    """T56: corpus-trained multinomial-NB quality filter (module
    header) — training is ONE map-side-combined (label, fold) count
    (128 rows out at any corpus size), the smoothed log-ratio model is
    built on the dense fold axis and broadcast back as one row, and
    scoring is an order-pinned left fold over each held-out doc's
    tokens. Score floor-1e6; all counts int64 — bit-exact."""
    docs = synth.sequences_df(spark, _NDOC).select(
        "doc_id", "n_tok", "tokens"
    )
    orig = docs.select(
        "doc_id", F.lit(1).cast("long").alias("label"), "n_tok", "tokens"
    )
    twin = docs.select(
        F.concat(F.col("doc_id"), F.lit("_deg")).alias("doc_id"),
        F.lit(0).cast("long").alias("label"),
        "n_tok",
        F.expr("transform(tokens, t -> t - (t % 4))").alias("tokens"),
    )
    corpus = orig.unionByName(twin).withColumn(
        "is_train",
        F.when(
            F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)") < _NTRAIN, 1
        ).otherwise(0),
    )
    folds = corpus.where("is_train = 1").select(
        "label",
        F.explode(
            F.expr(f"transform(tokens, t -> CAST(t % {_D} AS BIGINT))")
        ).alias("fold"),
    )
    cnts = folds.groupBy("label", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    axis = spark.range(_D).select(F.col("id").cast("long").alias("fold"))
    dense = (
        axis.join(
            cnts.where("label = 1").select("fold", F.col("c").alias("c1")),
            "fold",
            "left",
        )
        .join(
            cnts.where("label = 0").select("fold", F.col("c").alias("c0")),
            "fold",
            "left",
        )
        .select(
            "fold",
            F.coalesce("c1", F.lit(0)).cast("long").alias("c1"),
            F.coalesce("c0", F.lit(0)).cast("long").alias("c0"),
        )
    )
    tot = dense.agg(
        F.sum("c1").alias("n1"), F.sum("c0").alias("n0")
    )
    model = (
        dense.crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(
            F.expr(
                f"transform(array_sort(collect_list("
                f"struct(fold, {_W_TREE} AS wj))), z -> z.wj)"
            ).alias("w")
        )
    )
    scored = (
        corpus.where("is_train = 0")
        .crossJoin(F.broadcast(model))
        .select(
            "doc_id",
            "label",
            "n_tok",
            F.expr(
                f"aggregate(tokens, CAST(0 AS DOUBLE),"
                f" (a, t) -> a + element_at(w,"
                f" CAST(t % {_D} AS INT) + 1))"
            ).alias("score_raw"),
        )
    )
    return scored.select(
        "doc_id",
        "label",
        "n_tok",
        F.expr(_FLOOR6.format(x="score_raw")).alias("score"),
        F.expr(
            "CAST(CASE WHEN score_raw > 0 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("pred"),
    )
