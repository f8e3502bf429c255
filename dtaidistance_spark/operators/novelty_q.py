"""T83 — n-gram novelty / duplication-rate curve over the corpus (the
RefinedWeb/SlimPajama dedup-planning metric, Penedo et al.'23 §3;
Lee et al.'22's dedup-rate accounting): before running expensive
near-dedup, a pipeline asks "processing docs in order, what fraction
of each document's shingles have ALREADY been seen?" — the answer
sizes the expected token savings and locates where duplication lives
(early corpus vs tail).

Semantics (declared): a 4-gram word shingle is NOVEL in the corpus
position where it first appears — ties broken by doc_id order (the
canonical "process in id order" convention) — and a doc's novelty is
its DISTINCT-shingle novel fraction.  The relational form needs no
sequential scan: novel(d, s) ⟺ min(doc_id over s) = d, so the plan
is explode → DISTINCT (doc, shingle) → ONE groupBy(shingle) min
aggregate (map-side combined) → join back on (shingle, doc) → per-doc
counts.  Two fact-sized shuffles (shingle key, then doc key), never
all-pairs; the Zipf-hot-shingle caveat is T81's, shared.

Emits per doc: distinct shingles, novel count, novelty fraction
(floor-1e6), plus the doc's contribution to the corpus duplicated-
shingle mass.  The corpus-level read lives in the gate: Σ novel =
|distinct shingles in corpus| EXACTLY (every shingle is novel exactly
once — the conservation identity).

Honest (gated) reading: these synthetic docs are INDEPENDENT draws
over a tiny vocabulary, so novelty decays with doc_id only through
vocabulary-collision (4-gram space ≈ 31⁴ ≈ 920k, corpus shingles
≈ tens of thousands — collisions exist but are rare): mean novelty
stays high (> 0.9) and the measured duplication mass is small — the
metric correctly reports "dedup will not save much here", the
opposite of a crawl corpus, and exactly what an audit should say.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 4

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


@register(
    "ngram_novelty",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, len(w) - {_K} + 2),
               i -> array_to_string(list_slice(w, i, i + {_K} - 1), ' ')))
             AS s
      FROM words
    ),
    firsts AS (
      SELECT s, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM sh GROUP BY s
    ),
    per AS (
      SELECT sh.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN f.first_doc = sh.doc_id
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM sh JOIN firsts f ON f.s = sh.s
      GROUP BY sh.doc_id
    )
    SELECT doc_id, n_shingles, n_novel,
           CAST(n_shingles - n_novel AS BIGINT) AS n_dup,
           CASE WHEN n_shingles > 0
                THEN {_F6.format(x="(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE))")}
                ELSE CAST(NULL AS DOUBLE) END AS novelty
    FROM per
    """,
)
def ngram_novelty(spark, sf_dir):
    """T83: per-doc 4-gram novelty in doc_id processing order (module
    header) — distinct shingles, one min-aggregate for first
    occurrence, join back, per-doc counts; conservation identity
    Σ novel = |corpus shingles| gated."""
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
    firsts = sh.groupBy("s").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    per = (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.selectExpr(
        "doc_id",
        "n_shingles",
        "n_novel",
        "CAST(n_shingles - n_novel AS BIGINT) AS n_dup",
        "CASE WHEN n_shingles > 0 THEN "
        + _F6.format(
            x="(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE))"
        )
        + " ELSE CAST(NULL AS DOUBLE) END AS novelty",
    )
