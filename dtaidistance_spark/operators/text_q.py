"""Text-analysis operators over the ``documents`` table: language-ID
heuristic, quality scoring, token counting, fingerprinting. All hot
paths are JVM-side SQL expressions (whole-stage codegen); the winnowing
fingerprint is the one Arrow-batched kernel.

Note on ``lang_id``: the synthetic corpus's ``lang`` column is a label,
not a property of the text (every doc is the same English-ish word
soup), so the heuristic's *output* is the contract — the oracle
recomputes the identical stopword-ratio rule in SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dtaidistance_spark.functions import fingerprint as FP
from dtaidistance_spark.operators.queries import T, register

_STOP = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOP)

# BPE-ish token pattern: letter runs, digit runs, or single punctuation
_TOK_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "lang_id",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
        FROM documents
    )
    SELECT doc_id, lang,
           round(len(list_filter(ws, x -> x IN ({_STOP_SQL})))::DOUBLE
                 / len(ws), 4) AS stop_ratio,
           CASE WHEN len(list_filter(ws, x -> x IN ({_STOP_SQL})))::DOUBLE
                     / len(ws) >= 0.05
                THEN 'en' ELSE 'und' END AS pred_lang
    FROM w
    """,
)
def lang_id(spark, sf_dir):
    """n-gram/stopword language-ID heuristic, pure SQL."""
    d = T(spark, sf_dir, "documents").withColumn(
        "_ws", F.split(F.lower("text"), " ")
    )
    stop_arr = F.array(*[F.lit(w) for w in _STOP])
    ratio = F.size(
        F.filter("_ws", lambda x: F.array_contains(stop_arr, x))
    ) / F.size("_ws")
    return d.select(
        "doc_id",
        "lang",
        F.round(ratio, 4).alias("stop_ratio"),
        F.when(ratio >= 0.05, "en").otherwise("und").alias("pred_lang"),
    )


@register(
    "doc_quality",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, n_chars, string_split(lower(text), ' ') AS ws,
               len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
        FROM documents
    )
    SELECT doc_id,
           len(ws) AS n_words,
           round(n_chars::DOUBLE / len(ws), 4) AS avg_word_len,
           round(n_punct::DOUBLE / n_chars, 4) AS punct_ratio,
           round(len(list_distinct(ws))::DOUBLE / len(ws), 4) AS uniq_ratio,
           round(least(1.0, len(ws) / 64.0)
                 * (len(list_distinct(ws))::DOUBLE / len(ws)), 4) AS quality
    FROM w
    """,
)
def doc_quality(spark, sf_dir):
    """Quality scoring: length, punctuation ratio, vocabulary diversity
    — the standard cheap pre-training filters, pure SQL."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.split(F.lower("text"), " ").alias("_ws"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), F.lit(0))).alias(
            "_n_punct"
        ),
    )
    n_words = F.size("_ws")
    uniq = F.size(F.array_distinct("_ws")) / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.col("n_chars") / n_words, 4).alias("avg_word_len"),
        F.round(F.col("_n_punct") / F.col("n_chars"), 4).alias("punct_ratio"),
        F.round(uniq, 4).alias("uniq_ratio"),
        F.round(F.least(F.lit(1.0), n_words / F.lit(64.0)) * uniq, 4).alias(
            "quality"
        ),
    )


@register(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{_TOK_PAT}')) AS re_tokens,
           md5(lower(text)) AS fp_md5
    FROM documents
    """,
)
def token_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex) and md5 content
    fingerprint, pure SQL in both engines."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOK_PAT), F.lit(0))).alias(
            "re_tokens"
        ),
        F.md5(F.lower("text")).alias("fp_md5"),
    )


@register(
    "corpus_curation",
    oracle=f"""
    WITH s AS (
        SELECT source,
               string_split(lower(text), ' ') AS ws,
               len(string_split(text, ' ')) AS ws_tokens,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep_dedup
        FROM documents
    ), f AS (
        SELECT source, ws_tokens, keep_dedup,
               len(list_filter(ws, x -> x IN ({_STOP_SQL})))::DOUBLE
                   / len(ws) >= 0.05 AS is_en,
               least(1.0, len(ws) / 64.0)
                   * (len(list_distinct(ws))::DOUBLE / len(ws)) AS quality
        FROM s
    )
    SELECT source,
           count(*)::BIGINT AS n_raw,
           sum(CASE WHEN keep_dedup THEN 1 ELSE 0 END)::BIGINT AS n_dedup,
           sum(CASE WHEN keep_dedup AND is_en THEN 1 ELSE 0 END)::BIGINT AS n_lang,
           sum(CASE WHEN keep_dedup AND is_en AND quality >= 0.5
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           coalesce(sum(CASE WHEN keep_dedup AND is_en AND quality >= 0.5
                             THEN ws_tokens END), 0)::BIGINT AS kept_tokens,
           round(avg(CASE WHEN keep_dedup AND is_en AND quality >= 0.5
                          THEN quality END), 4) AS avg_kept_quality
    FROM f GROUP BY source
    """,
)
def corpus_curation(spark, sf_dir):
    """End-to-end training-data curation funnel in ONE pass: exact dedup
    (md5 window keeper), language gate (the ``lang_id`` stopword rule),
    quality gate (the ``doc_quality`` score >= 0.5), then per-source
    funnel counts + kept token volume — the composition a real corpus
    pipeline runs, entirely JVM-side SQL (one window + one aggregate,
    both shuffles on small keys; the oracle re-runs the identical funnel
    in DuckDB)."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.split(F.lower("text"), " ").alias("_ws")
    )
    stop_arr = F.array(*[F.lit(w) for w in _STOP])
    n_words = F.size("_ws")
    is_en = (
        F.size(F.filter("_ws", lambda x: F.array_contains(stop_arr, x)))
        / n_words
        >= 0.05
    )
    quality = (
        F.least(F.lit(1.0), n_words / F.lit(64.0))
        * (F.size(F.array_distinct("_ws")) / n_words)
    )
    keep_dedup = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(F.md5("text"))
    )
    kept = F.col("keep_dedup") & F.col("is_en") & (F.col("quality") >= 0.5)
    staged = d.select(
        "source",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        keep_dedup.alias("keep_dedup"),
        is_en.alias("is_en"),
        quality.alias("quality"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("keep_dedup"), 1).otherwise(0)).alias("n_dedup"),
        F.sum(F.when(F.col("keep_dedup") & F.col("is_en"), 1).otherwise(0)).alias(
            "n_lang"
        ),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("ws_tokens"))), F.lit(0)).alias(
            "kept_tokens"
        ),
        F.round(F.avg(F.when(kept, F.col("quality"))), 4).alias(
            "avg_kept_quality"
        ),
    )


@register("winnowing_overlap")
def winnowing_overlap(spark, sf_dir):
    """Copy-detection via winnowing fingerprints: pairs of docs sharing
    >= 8 rolling-hash fingerprints (rows-only; the kernel is gated
    against a plain-Python oracle in tests/test_text.py). The join is
    the scalable shape: explode fingerprints -> bucket join on the
    fingerprint value -> count shared per pair."""
    docs = T(spark, sf_dir, "documents")
    fps = FP.fingerprint_docs(docs)
    ex = fps.select("doc_id", "n_fp", F.explode("fingerprints").alias("fp"))
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.least("a.n_fp", "b.n_fp").alias("_min_fp"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .withColumn(
            "overlap", F.round(F.col("shared_fp") / F.col("_min_fp"), 4)
        )
        .where(F.col("overlap") >= 0.8)
        .select("id_a", "id_b", "shared_fp", "overlap")
        .orderBy("id_a", "id_b")
    )


@register("lang_id_ngram")
def lang_id_ngram_q(spark, sf_dir):
    """Character-trigram profile language-ID (Cavnar-Trenkle shape) —
    the n-gram twin of the stopword heuristic, Arrow-batched kernel
    with built-in en/fr/de/es profiles. Rows-only; kernel==python
    determinism gated in test_pipeline_ops."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("struct<pred_lang: string, score: double>")
    def klang(texts: pd.Series) -> pd.DataFrame:
        out = [FP.lang_id_ngram(t) for t in texts]
        return pd.DataFrame(
            {"pred_lang": [o[0] for o in out], "score": [o[1] for o in out]}
        )

    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id", klang("text").alias("_p")
    ).select("doc_id", "_p.pred_lang", "_p.score").orderBy("doc_id")


@register(
    "winnowing_check",
    oracle="""
    SELECT doc_id, true AS has_fp, true AS fp_bounded
    FROM documents
    """,
)
def winnowing_check(spark, sf_dir):
    """Invariant projection of the winnowing fingerprinter: every doc
    long enough for a k-gram (k=8, all synthetic docs qualify) yields
    at least one fingerprint, and never more than the number of k-char
    windows (n_fp <= len(text) - k + 1 — winnowing only THINS the
    rolling-hash set)."""
    docs = T(spark, sf_dir, "documents")
    fps = FP.fingerprint_docs(docs).join(
        docs.select("doc_id", F.length("text").alias("_len")), "doc_id"
    )
    return fps.select(
        "doc_id",
        (F.col("n_fp") >= 1).alias("has_fp"),
        (F.col("n_fp") <= F.col("_len") - 7).alias("fp_bounded"),
    )


@register(
    "lang_id_ngram_check",
    oracle="""
    SELECT doc_id, true AS lang_known, true AS score_ok
    FROM documents
    """,
)
def lang_id_ngram_check(spark, sf_dir):
    """Invariant projection of the char-trigram language classifier:
    every doc classified into the profile set (or 'und'), score a
    valid trigram-mass fraction in [0, 1]."""
    out = lang_id_ngram_q(spark, sf_dir)
    return out.select(
        "doc_id",
        F.col("pred_lang").isin("en", "fr", "de", "es", "und").alias("lang_known"),
        ((F.col("score") >= 0) & (F.col("score") <= 1)).alias("score_ok"),
    )
