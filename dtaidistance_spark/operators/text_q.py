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


@register(
    "unigram_logprob",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
    tot AS (SELECT sum(cnt) AS tot FROM v),
    lp AS (SELECT tok, ln(cnt::DOUBLE / tot) AS logp FROM v, tot),
    s AS (
        SELECT doc_id, count(*)::BIGINT AS n_tok, avg(-logp) AS anlp
        FROM t JOIN lp USING (tok) GROUP BY doc_id
    )
    SELECT doc_id, n_tok,
           round(anlp, 4) AS avg_neg_logprob,
           anlp <= 3.45 AS keep
    FROM s
    """,
)
def unigram_logprob(spark, sf_dir):
    """Perplexity-style quality filter (the CCNet recipe, with the
    corpus itself as the LM): train a unigram language model over the
    corpus in one aggregation, score every doc by its mean negative
    log-probability, keep the low-perplexity side of a fixed threshold.
    Entirely JVM-side SQL — explode -> count = the LM "training" (one
    shuffle on token, map-side combined), join the logprobs back onto
    the exploded tokens (token-keyed shuffle join; Zipf-skewed keys like
    'the' are exactly what AQE skew-join splitting is enabled for), one
    doc-keyed aggregate for the scores. At corpus scale the vocab table
    is millions of rows — small enough that AQE turns the score join
    into a broadcast, and the "model" could be persisted and reused
    across scoring runs, which is how the real pipeline ships it."""
    toks = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    # persisted so the LM is trained ONCE — both the total and the
    # scoring join read the materialized vocab instead of re-running
    # the explode+count over the corpus (2 redundant full scans at
    # 100 TB otherwise); this is also the "ship the trained model"
    # hook: persist -> write once, reuse across scoring runs
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).persist()
    total = vocab.agg(F.sum("cnt").alias("tot"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("cnt") / F.col("tot")).alias("logp")
    )
    anlp = F.avg(-F.col("logp"))
    return (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(anlp, 4).alias("avg_neg_logprob"),
            (anlp <= 3.45).alias("keep"),
        )
    )


@register(
    "gopher_repetition",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    base AS (
        SELECT doc_id, len(ws)::BIGINT AS n_words,
               list_aggregate(list_transform(ws, w -> len(w)), 'sum')::DOUBLE
                   / len(ws) AS mwl
        FROM d
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS g
        FROM d WHERE len(ws) >= 2
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
    bga AS (
        SELECT doc_id, max(c)::DOUBLE / sum(c) AS top2 FROM bgc GROUP BY 1
    ),
    fg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 4),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                           || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        FROM d WHERE len(ws) >= 5
    ),
    fgc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY 1, 2),
    fga AS (
        SELECT doc_id,
               coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::DOUBLE / sum(c)
                   AS dup5
        FROM fgc GROUP BY 1
    )
    SELECT base.doc_id, n_words,
           round(mwl, 4) AS mean_word_len,
           round(coalesce(top2, 0), 4) AS top_2gram_frac,
           round(coalesce(dup5, 0), 4) AS dup_5gram_frac,
           (coalesce(top2, 0) <= 0.08 AND coalesce(dup5, 0) <= 0.15
            AND mwl BETWEEN 3 AND 10) AS keep
    FROM base
    LEFT JOIN bga ON base.doc_id = bga.doc_id
    LEFT JOIN fga ON base.doc_id = fga.doc_id
    """,
)
def gopher_repetition(spark, sf_dir):
    """Repetition-based quality filters from Gopher (Rae et al. 2021,
    Appendix A1.1), the occurrence-fraction variant: mean word length
    band, fraction of word-bigrams taken by the single most repeated
    bigram, fraction of word-5-grams that are duplicated — the signals
    that catch boilerplate/spam which per-doc diversity scores miss.
    All JVM-side SQL: two explode->count aggregations keyed on
    (doc_id, gram) — naturally parallel keys, no skew (each doc owns
    its grams), map-side combined — left-joined back onto the doc-level
    stats; thresholds chosen at ~p90 of the corpus distribution."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    base = d.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        (
            F.aggregate("ws", F.lit(0), lambda acc, w: acc + F.length(w))
            .cast("double")
            / F.size("ws")
        ).alias("mwl"),
    )

    def grams(n: int):
        expr = (
            "transform(sequence(1, size(ws) - {b}), i -> "
            + " || ' ' || ".join(
                f"element_at(ws, i + {j})" for j in range(n)
            )
            + ")"
        ).format(b=n - 1)
        return (
            d.where(F.size("ws") >= n)
            .select("doc_id", F.explode(F.expr(expr)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    bga = grams(2).groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top2")
    )
    fga = grams(5).groupBy("doc_id").agg(
        (
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).cast("double")
            / F.sum("c")
        ).alias("dup5")
    )
    top2 = F.coalesce("top2", F.lit(0.0))
    dup5 = F.coalesce("dup5", F.lit(0.0))
    return (
        base.join(bga, "doc_id", "left")
        .join(fga, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round("mwl", 4).alias("mean_word_len"),
            F.round(top2, 4).alias("top_2gram_frac"),
            F.round(dup5, 4).alias("dup_5gram_frac"),
            (
                (top2 <= 0.08) & (dup5 <= 0.15) & F.col("mwl").between(3, 10)
            ).alias("keep"),
        )
    )


@register(
    "dsir_weights",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bkt
        FROM t
    ),
    raw AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
    tgt AS (
        SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en'
        GROUP BY bkt
    ),
    tots AS (
        SELECT (SELECT sum(cr) FROM raw) AS tr,
               (SELECT coalesce(sum(ct), 0) FROM tgt) AS tt
    ),
    model AS (
        SELECT raw.bkt,
               ln((coalesce(ct, 0) + 1.0) / (tt + 4096.0))
                   - ln((cr + 1.0) / (tr + 4096.0)) AS logratio
        FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt, tots
    )
    SELECT doc_id, lang, count(*)::BIGINT AS n_tok,
           round(avg(logratio), 4) AS dsir_weight
    FROM b JOIN model USING (bkt)
    GROUP BY doc_id, lang
    """,
)
def dsir_weights(spark, sf_dir):
    """Data Selection with Importance Resampling (Xie et al., NeurIPS
    2023): per-doc importance weight = mean log-ratio of a target-domain
    hashed-feature unigram LM (here: the English-language slice as
    the target domain) over the raw-corpus LM, Laplace-smoothed, features = word
    unigrams hashed into 4096 buckets. The DSIR recipe without the
    Gumbel sampling step (nondeterministic by design — the weights ARE
    the deliverable; resampling is one ORDER BY weight + rand away).
    Entirely JVM SQL: one explode + md5-bucket projection, two bucket
    count aggregates (4096-row model tables — broadcast-join territory,
    and the trained model persists/reuses across scoring runs at
    scale), one doc aggregate. Hash is the portable md5-prefix trick so
    DuckDB re-derives bit-identical buckets."""
    toks = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("tok"),
    )
    b = toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % 4096
        ).alias("bkt"),
    )
    raw = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        b.where(F.col("lang") == "en")
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tots = raw.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    )
    model = (
        raw.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bkt",
            (
                F.log((F.coalesce("ct", F.lit(0)) + 1.0) / (F.col("tt") + 4096.0))
                - F.log((F.col("cr") + 1.0) / (F.col("tr") + 4096.0))
            ).alias("logratio"),
        )
    )
    return (
        b.join(F.broadcast(model), "bkt")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(F.avg("logratio"), 4).alias("dsir_weight"),
        )
    )
