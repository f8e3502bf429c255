"""T84 — lexical-richness spectrum per document (Yule Biometrika'44;
Simpson Nature'49; Herdan'60; Sichel'75): the vocabulary-richness
dials a curation pipeline reads per doc before LM training — is this
document repeating itself at the WORD level?  Completes the
vocabulary family: T36 reads corpus-level Heaps growth, T38/T40
source-level entropy/JSD, T42 the Zipf slope; this is the PER-DOC
frequency-spectrum summary, the repetition complement of the Gopher
n-gram signals (which read contiguous repeats; Yule/Simpson read
bag-of-words repeats wherever they sit).

Over the whitespace/lowercase tokenization contract shared with the
rest of the documents family:

    f_w       = in-doc frequency of word w;  N = Σf,  V = |{w}|
    yule_k    = 10⁴ · (Σf² − N) / N²        (Yule's characteristic)
    simpson_d = (Σf² − N) / (N·(N−1))       (repeat-rate: P[two random
                                             tokens are the same word])
    ttr       = V/N;  hapax_ratio = |f=1|/V;  sichel_s = |f=2|/V
    herdan_c  = ln V / ln N                 (the log-log TTR)

Exactness: N, V, Σf², |f=1|, |f=2| are exact INT64 aggregates of a
(doc, word) count (one explode + two keyed aggregates, map-side
combined); the five ratios are ONE shared double tree; floor-1e6;
NULL-guarded at N < 2 (herdan additionally at V = 1 ↔ ln N = 0
cannot happen for N ≥ 2... it can for V = 1: guarded).

Honest (gated) reading — measured at sf0.01 (500 docs, median 56
words over a ~25-type working set): the LENGTH-SENSITIVE dials read
"rich" only because the docs are short — TTR median 0.46 and
hapax_ratio 0.36 fall steeply with n_words (the classic TTR length
artifact, corr(ttr, ln N) strongly negative and gated) — while the
length-robust pair reads the truth: simpson_d median 0.033 sits at
the flat-soup collision line ≈ 1/V (word soup drawn near-uniformly
from a small vocabulary) and Yule's K ≈ 323 is its 10⁴-scaled twin
(K = 10⁴·D·(N−1)/N, an algebraic identity the gate checks).  The
two dial FAMILIES disagreeing about the same corpus — richness
artifacts vs flatness facts — is the reason a pipeline carries
both, and the gate pins the disagreement.  The saturated corners
(all-same-word: D = 1, K ≈ 10⁴; all-distinct: everything at its
rich extreme) live in pytest.

Scale shape: one explode shuffle keyed (doc_id, word) with map-side
partial counts, then a per-doc aggregate — the standard
explode-gram plan; no skew (doc_id is in every key).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


_KY = f"(10000.0 * {_d('s2 - n_words')} / ({_d('n_words')} * {_d('n_words')}))"
_SD = f"({_d('s2 - n_words')} / ({_d('n_words')} * {_d('n_words - 1')}))"
_TTR = f"({_d('v_types')} / {_d('n_words')})"
_HAP = f"({_d('hapax')} / {_d('v_types')})"
_SIC = f"({_d('dis')} / {_d('v_types')})"
_HC = f"(ln({_d('v_types')}) / ln({_d('n_words')}))"
_G = "n_words >= 2"

_OUT = [
    f"CASE WHEN {_G} THEN {_F6.format(x=_KY)}"
    " ELSE CAST(NULL AS DOUBLE) END AS yule_k",
    f"CASE WHEN {_G} THEN {_F6.format(x=_SD)}"
    " ELSE CAST(NULL AS DOUBLE) END AS simpson_d",
    f"CASE WHEN {_G} THEN {_F6.format(x=_TTR)}"
    " ELSE CAST(NULL AS DOUBLE) END AS ttr",
    f"CASE WHEN {_G} THEN {_F6.format(x=_HAP)}"
    " ELSE CAST(NULL AS DOUBLE) END AS hapax_ratio",
    f"CASE WHEN {_G} THEN {_F6.format(x=_SIC)}"
    " ELSE CAST(NULL AS DOUBLE) END AS sichel_s",
    f"CASE WHEN {_G} AND v_types >= 2 THEN {_F6.format(x=_HC)}"
    " ELSE CAST(NULL AS DOUBLE) END AS herdan_c",
]


@register(
    "lexical_richness",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM w GROUP BY doc_id, w
    ),
    d AS (
      SELECT doc_id,
             CAST(SUM(f) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS v_types,
             CAST(SUM(f * f) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dis
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_words, v_types, s2, hapax, dis,
           {", ".join(_OUT)}
    FROM d
    """,
)
def lexical_richness(spark, sf_dir):
    """T84: Yule's K / Simpson's D / TTR / hapax / Sichel / Herdan per
    doc (module header) — explode + two keyed int64 aggregates, one
    shared double tree, floor-1e6."""
    words = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    )
    counts = words.groupBy("doc_id", "w").agg(
        F.count("*").cast("long").alias("f")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("f").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("v_types"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("s2"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
        .cast("long")
        .alias("dis"),
    )
    return per_doc.selectExpr(
        "doc_id", "n_words", "v_types", "s2", "hapax", "dis", *_OUT
    )
