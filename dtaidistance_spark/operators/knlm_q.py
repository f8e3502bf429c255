"""T57 — interpolated Kneser-Ney bigram language model (Kneser & Ney
ICASSP'95; Chen & Goodman '98 — the smoothing every production n-gram
LM perplexity filter actually ships, one step past T41's Jelinek-
Mercer): absolute discount D = 3/4 (exact in binary) with the
CONTINUATION-count backoff that distinguishes KN from naive backoff —
P(w2|w1) = max(c12−D,0)/c1 + [D·N₁₊(w1,·)/c1] · [N₁₊(·,w2)/N₁₊(··)].

Tokens fold mod 256 so bigram statistics are dense.  All model inputs
are INTEGER: c12, c1 = Σ_w2 c12, the three continuation counts
N₁₊(w1,·) (distinct followers), N₁₊(·,w2) (distinct predecessors),
N₁₊(··) (distinct bigram types).  P_KN is one shared verbatim float
tree over five int64s — bit-exact per row, no float sums anywhere in
the model query.  KN's normalization Σ_w2 P(w2|w1) = 1 is algebraic
given these definitions (the discount mass D·N₁₊(w1,·)/c1 is exactly
what the continuation term redistributes); the pytest gate verifies it
numerically over the FULL 256-way vocabulary for sample contexts.

Scale shape (better than T41's): bigram formation is a scan-side HOF
pair expansion — NO per-doc lag window, so the corpus never sorts;
counts are map-side-combined; the model tables are vocab²-bounded and
broadcast back onto the scoring stream (Zipf-skewed token keys are
what AQE skew-join splitting is for).  Top-k model rows via
TakeOrderedAndProject.  Per-doc scoring avg(-ln p) at round(4) under
the float-sum precedent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_NB = 256  # docs
_MOD = 256  # token fold
_TOPK = 256  # model rows emitted

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# P_KN over int64 columns c12, c1, nfollow, nprec, ntypes — shared verbatim
_PKN = (
    "(greatest(CAST(c12 AS DOUBLE) - CAST(0.75 AS DOUBLE),"
    " CAST(0 AS DOUBLE)) / CAST(c1 AS DOUBLE)"
    " + (CAST(0.75 AS DOUBLE) * CAST(nfollow AS DOUBLE)"
    " / CAST(c1 AS DOUBLE))"
    " * (CAST(nprec AS DOUBLE) / CAST(ntypes AS DOUBLE)))"
)

_BG_DUCK = f"""
    , pos AS (
      SELECT doc_id, unnest(list_transform(range(n_tok - 1), i ->
        [CAST(tokens[i + 1] % {_MOD} AS BIGINT),
         CAST(tokens[i + 2] % {_MOD} AS BIGINT)])) AS pr
      FROM synth
    ),
    bg AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2 FROM pos),
    bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM bg GROUP BY w1, w2
    ),
    lft AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS nfollow
      FROM bi GROUP BY w1
    ),
    rgt AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS nprec FROM bi GROUP BY w2
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM bi)
"""

_BG_SPARK = (
    f"transform(sequence(0, n_tok - 2), i -> array("
    f"CAST(element_at(tokens, i + 1) % {_MOD} AS BIGINT),"
    f"CAST(element_at(tokens, i + 2) % {_MOD} AS BIGINT)))"
)


def _spark_model_tables(spark, sf_dir):
    docs = synth.sequences_df(spark, _NB).select("doc_id", "n_tok", "tokens")
    bg = docs.select(
        "doc_id", F.explode(F.expr(_BG_SPARK)).alias("pr")
    ).select(
        "doc_id",
        F.expr("element_at(pr, 1)").alias("w1"),
        F.expr("element_at(pr, 2)").alias("w2"),
    )
    bi = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    lft = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("nfollow"),
    )
    rgt = bi.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("nprec")
    )
    tot = bi.agg(F.count(F.lit(1)).cast("long").alias("ntypes"))
    return bg, bi, lft, rgt, tot


@register(
    "kn_bigram_model",
    oracle=synth_sql(_NB)
    + _BG_DUCK
    + f"""
    SELECT w1, w2, c12, c1, nfollow, nprec, ntypes,
           {_FLOOR6.format(x=_PKN)} AS p_kn
    FROM bi JOIN lft USING (w1) JOIN rgt USING (w2), tot
    ORDER BY c12 DESC, w1, w2 LIMIT {_TOPK}
    """,
)
def kn_bigram_model(spark, sf_dir):
    """T57: the KN bigram model's top-{_TOPK} rows by count — five
    int64 sufficient statistics + the shared-verbatim P_KN tree
    (floor-1e6), selected by TakeOrderedAndProject.  No float sums:
    every row is independently bit-exact."""
    bg, bi, lft, rgt, tot = _spark_model_tables(spark, sf_dir)
    joined = (
        bi.join(F.broadcast(lft), "w1")
        .join(F.broadcast(rgt), "w2")
        .crossJoin(F.broadcast(tot))
    )
    return (
        joined.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "nfollow",
            "nprec",
            "ntypes",
            F.expr(_FLOOR6.format(x=_PKN)).alias("p_kn"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(_TOPK)
    )


@register(
    "kn_doc_logprob",
    oracle=synth_sql(_NB)
    + _BG_DUCK
    + f"""
    , scored AS (
      SELECT bg.doc_id, -ln({_PKN}) AS nll
      FROM bg JOIN bi USING (w1, w2) JOIN lft USING (w1)
           JOIN rgt USING (w2), tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(nll), 4) AS avg_neg_logprob,
           avg(nll) <= ln(CAST({_MOD} AS DOUBLE)) AS keep
    FROM scored GROUP BY doc_id
    """,
)
def kn_doc_logprob(spark, sf_dir):
    """T57b: per-doc KN bigram perplexity filter — every bigram scored
    with the full interpolated-KN probability (all observed, so
    c12 ≥ 1 > D), per-doc avg(−ln p) at round(4) under the float-sum
    precedent; keep = better than the uniform-model baseline ln 256.
    Plan: scan-side HOF bigrams (no lag window), broadcast model
    tables onto the stream, one doc-keyed reduce."""
    bg, bi, lft, rgt, tot = _spark_model_tables(spark, sf_dir)
    scored = (
        bg.join(bi, ["w1", "w2"])
        .join(F.broadcast(lft), "w1")
        .join(F.broadcast(rgt), "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(f"-ln({_PKN})").alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("nll"), 4).alias("avg_neg_logprob"),
        (F.avg("nll") <= F.expr(f"ln(CAST({_MOD} AS DOUBLE))")).alias(
            "keep"
        ),
    )
